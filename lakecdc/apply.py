"""Epoch apply: the engine's main pipeline.

    WAL segment (read_parquet, streamed as Arrow blocks)
      -> map_batches: validate (counted drops) + batch-local LWW
         pre-compaction (combiner) + bucket assignment      [stateless]
      -> groupby("bucket")                                  [the shuffle]
      -> map_groups(PartitionMerger, concurrency=N)         [actor pool]
         per bucket: global LWW compact -> merge vs lake partition
         -> atomic file write -> idempotent manifest commit
      -> lineage rows (one per partition; tiny, collected on driver)

Exactly-once: the merge is deterministic, file paths are deterministic,
and the manifest commit is an atomic create — a retried/replayed
partition merge either no-ops (already committed) or rewrites identical
bytes. Resume-from-checkpoint = re-run ``apply_epoch``; committed
partitions short-circuit inside the merger.

Reference analogue: one full `run_all.py` stage (stream chunks ->
filter -> broadcast-join -> per-chunk partial aggregate -> global
accumulate -> enriched output), re-expressed with the accumulation as
a hash-partitioned LWW merge.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from lakecdc import manifest, wal
from lakecdc.config import EngineConfig, OP_DELETE
from lakecdc.evolve import unify_concat
from lakecdc.merge import compact_events, last_per_key, merge_partition
from lakecdc.schemas import LAKE_FILE_SCHEMA, LINEAGE_SCHEMA, WAL_SCHEMA_V0
from lakecdc.shuffle import with_bucket

_LAKE_FILE_SCHEMA_V0 = pa.schema(
    [f for f in LAKE_FILE_SCHEMA if f.name != "source"]
)


def _validation_mask(batch: pa.Table) -> pa.BooleanArray:
    from lakecdc.config import VALID_OPS

    ok = pc.is_in(batch["op"], value_set=pa.array(sorted(VALID_OPS)))
    ok = pc.and_kleene(ok, pc.is_valid(batch["doc_id"]))
    ok = pc.and_kleene(ok, pc.is_valid(batch["lsn"]))
    is_delete = pc.equal(batch["op"], OP_DELETE)
    ok = pc.and_kleene(
        ok, pc.or_kleene(is_delete, pc.is_valid(batch["tokens"]))
    )
    return pc.fill_null(ok, False)


def make_prep_fn(num_buckets: int):
    """The stateless pre-shuffle stage. Invalid events are not dropped
    silently (reference contrast: on_bad_lines="skip"): they are marked
    `_invalid`, shipped (they are rare), and counted per partition into
    lineage by the merger."""

    _wal_cols = {"lsn", "op", "doc_id", "tokens", "n_tok", "source"}

    def prep(batch: pa.Table) -> pa.Table:
        # Drop non-WAL columns (e.g. the hive `epoch` partition column
        # the parquet reader infers from the directory layout).
        batch = batch.select([c for c in batch.column_names if c in _wal_cols])
        mask = _validation_mask(batch)
        valid = batch.filter(mask)
        # Enforce n_tok == len(tokens) (null for deletes).
        valid = valid.set_column(
            valid.schema.get_field_index("n_tok"),
            "n_tok",
            pc.cast(pc.list_value_length(valid["tokens"]), pa.int32()),
        )
        valid = compact_events(valid)  # batch-local combiner: bounds hot keys
        valid = valid.append_column(
            "_invalid", pa.array([False] * valid.num_rows, type=pa.bool_())
        )
        n_bad = batch.num_rows - pc.sum(pc.cast(mask, pa.int64())).as_py()
        if n_bad:
            invalid = batch.filter(pc.invert(mask))
            invalid = invalid.set_column(
                invalid.schema.get_field_index("doc_id"),
                "doc_id",
                pc.fill_null(invalid["doc_id"], ""),
            )
            invalid = invalid.set_column(
                invalid.schema.get_field_index("lsn"),
                "lsn",
                pc.fill_null(invalid["lsn"], -1),
            )
            invalid = invalid.append_column(
                "_invalid", pa.array([True] * invalid.num_rows, type=pa.bool_())
            )
            out = pa.concat_tables([valid, invalid])
        else:
            out = valid
        return with_bucket(out, num_buckets)

    return prep


class PartitionMerger:
    """Stateful actor-pool merger: one actor handles many buckets, each
    exactly once per epoch. The lake snapshot (partition -> files) is
    built ONCE per actor in __init__ — the broadcast-small-side
    pattern (reference: the dim-table dicts built before streaming,
    scripts/individual_support.py:17-27)."""

    def __init__(self, cfg: EngineConfig, epoch: int):
        self.cfg = cfg
        self.epoch = epoch
        snap = manifest.snapshot(cfg, up_to_epoch=epoch - 1)
        self.prev_files: dict[int, list[str]] = {
            p: rec["files"] for p, rec in snap.items()
        }

    def _read_lake_partition(self, bucket: int) -> pa.Table | None:
        files = self.prev_files.get(bucket)
        if not files:
            return None
        tables = [pq.read_table(f) for f in files]
        # Null-backfill pre-evolution partition files (additive schema
        # evolution on the read path).
        return unify_concat(tables, LAKE_FILE_SCHEMA)

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group["bucket"][0].as_py())
        cfg, epoch = self.cfg, self.epoch

        existing = manifest.read_record(cfg, epoch, bucket)
        if existing is not None:
            return _lineage_row(existing)  # resume/retry: no-op

        n_invalid = pc.sum(pc.cast(group["_invalid"], pa.int64())).as_py() or 0
        events = group.filter(pc.invert(group["_invalid"])).drop_columns(
            ["bucket", "_invalid"]
        )
        if events.num_rows:
            lsn_lo = pc.min(events["lsn"]).as_py()
            lsn_hi = pc.max(events["lsn"]).as_py()
        else:
            lsn_lo = lsn_hi = -1

        # Global per-bucket compact across the epoch's batches: the
        # "final" phase of the two-phase LWW merge.
        delta = compact_events(events)
        n_del = pc.sum(
            pc.cast(pc.equal(delta["op"], OP_DELETE), pa.int64())
        ).as_py() or 0
        n_up = delta.num_rows - n_del

        lake_tbl = self._read_lake_partition(bucket)
        evolved = "source" in delta.column_names or (
            lake_tbl is not None and "source" in lake_tbl.column_names
        )
        target = LAKE_FILE_SCHEMA if evolved else _LAKE_FILE_SCHEMA_V0
        merged, stats = merge_partition(lake_tbl, delta, schema=target)

        path = cfg.partition_epoch_file(bucket, epoch)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(merged, tmp, row_group_size=cfg.max_rows_per_file)
        os.replace(tmp, path)
        bytes_written = os.path.getsize(path)

        record = {
            "epoch": epoch,
            "partition": bucket,
            "lsn_watermark": lsn_hi,
            "files": [path],
            "lineage": {
                "lsn_lo": lsn_lo,
                "lsn_hi": lsn_hi,
                "rows_upserted": int(n_up),
                "rows_deleted": int(n_del),
                "rows_invalid": int(n_invalid),
                "bytes_written": int(bytes_written),
                "rows_live": stats["rows_live"],
                "rows_tombstoned": stats["rows_tombstoned"],
            },
        }
        manifest.commit(cfg, record)
        return _lineage_row(record)


def _lineage_row(record: dict[str, Any]) -> pa.Table:
    lg = record.get("lineage", {})
    return pa.Table.from_pylist(
        [
            {
                "epoch": record["epoch"],
                "partition": record["partition"],
                "lsn_lo": lg.get("lsn_lo", -1),
                "lsn_hi": lg.get("lsn_hi", -1),
                "rows_upserted": lg.get("rows_upserted", 0),
                "rows_deleted": lg.get("rows_deleted", 0),
                "rows_invalid": lg.get("rows_invalid", 0),
                "bytes_written": lg.get("bytes_written", 0),
            }
        ],
        schema=LINEAGE_SCHEMA,
    )


def apply_epoch(cfg: EngineConfig, epoch: int) -> pa.Table:
    """Apply one WAL epoch to the lake; returns the per-partition
    lineage table (one small row per touched partition)."""
    ds = wal.read_segment(cfg, epoch)
    ds = ds.map_batches(
        make_prep_fn(cfg.num_buckets),
        batch_format="pyarrow",
        batch_size=cfg.wal_batch_size,
        zero_copy_batch=True,
    )
    if cfg.merge_concurrency:
        concurrency = cfg.merge_concurrency
    else:
        import ray

        # Size the merger pool to the cluster but never beyond the
        # number of partitions; leave headroom for the read/prep stages
        # so the pipeline doesn't serialize.
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, min(cfg.num_buckets, cpus - 1))
    lineage_ds = ds.groupby("bucket").map_groups(
        PartitionMerger,
        fn_constructor_args=(cfg, epoch),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    rows = lineage_ds.take_all()  # one row per partition — metadata-sized
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)


def apply_all(cfg: EngineConfig, max_epoch: int | None = None) -> pa.Table:
    """Tail the WAL: apply every epoch present, in order. This is the
    `run_all.py` analogue."""
    tables = []
    for epoch in wal.list_epochs(cfg):
        if max_epoch is not None and epoch > max_epoch:
            break
        tables.append(apply_epoch(cfg, epoch))
    if not tables:
        return LINEAGE_SCHEMA.empty_table()
    return pa.concat_tables(tables)
