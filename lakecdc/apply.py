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
from lakecdc.config import EngineConfig, OP_DELETE, atomic_write
from lakecdc.evolve import conform, unify_concat
from lakecdc.merge import compact_events, compact_keep_mask, merge_partition
from lakecdc.schemas import LAKE_FILE_SCHEMA, LINEAGE_SCHEMA, lake_write_options
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


def make_prep_fn(num_buckets: int, merge_engine: str = "lww"):
    """The stateless pre-shuffle stage. Invalid events are not dropped
    silently (reference contrast: on_bad_lines="skip"): they are marked
    `_invalid`, shipped (they are rare), and counted per partition into
    lineage by the merger.

    Under ``merge_engine="partial"`` the stage validates with patch
    semantics and compacts to CELL rows (per-field writer LSNs) via
    the associative fold — the same combiner guarantee: at most one
    row per key per batch reaches the shuffle."""

    _wal_cols = {"lsn", "op", "doc_id", "tokens", "n_tok", "source"}

    if merge_engine == "partial":
        from lakecdc.partial import (
            events_to_cells,
            fold_cells,
            validation_mask_partial,
        )

        def prep_partial(batch: pa.Table) -> pa.Table:
            batch = batch.select(
                [c for c in batch.column_names if c in _wal_cols]
            )
            mask = validation_mask_partial(batch)
            valid = fold_cells(events_to_cells(batch.filter(mask)))
            valid = valid.append_column(
                "_invalid", pa.array([False] * valid.num_rows, type=pa.bool_())
            )
            # `or 0`: pc.sum of a zero-row mask is null, and a zero-row
            # batch (empty resubmit epoch) must not TypeError the apply
            n_bad = batch.num_rows - (
                pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            )
            if n_bad:
                bad = batch.filter(pc.invert(mask))
                bad = bad.set_column(
                    bad.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc.fill_null(bad["doc_id"], ""),
                )
                bad = bad.set_column(
                    bad.schema.get_field_index("lsn"),
                    "lsn",
                    pc.fill_null(bad["lsn"], -1),
                )
                bad_cells = events_to_cells(bad).append_column(
                    "_invalid", pa.array([True] * bad.num_rows, type=pa.bool_())
                )
                out = pa.concat_tables([valid, bad_cells])
            else:
                out = valid
            return with_bucket(out, num_buckets)

        return prep_partial

    def prep(batch: pa.Table) -> pa.Table:
        # Drop non-WAL columns (e.g. the hive `epoch` partition column
        # the parquet reader infers from the directory layout).
        batch = batch.select([c for c in batch.column_names if c in _wal_cols])
        valid_np = _validation_mask(batch).to_numpy(zero_copy_only=False)
        # Fused combiner: ONE keep-mask (max-LSN valid row per key +
        # all invalid rows) and ONE filter of the wide token payload.
        # The old shape (filter valid -> compact sort+take -> concat
        # invalid) copied the full batch twice before dropping ~90% of
        # it; this copies only the survivors, which at 128M-event bench
        # scale removes ~40% of map-task CPU and memory traffic.
        keep = compact_keep_mask(batch, valid_np)
        out = batch.filter(pa.array(keep))
        kept_valid = pa.array(valid_np[keep])
        # Enforce n_tok == len(tokens) on valid rows (null for
        # deletes); invalid rows keep whatever they carried.
        out = out.set_column(
            out.schema.get_field_index("n_tok"),
            "n_tok",
            pc.if_else(
                kept_valid,
                pc.cast(pc.list_value_length(out["tokens"]), pa.int32()),
                out["n_tok"],
            ),
        )
        # Invalid rows may carry null doc_id / lsn: normalize so they
        # survive the bucket hash and the reducer's lineage count.
        # (No-op for valid rows — validation requires both non-null.)
        out = out.set_column(
            out.schema.get_field_index("doc_id"),
            "doc_id",
            pc.fill_null(out["doc_id"], ""),
        )
        out = out.set_column(
            out.schema.get_field_index("lsn"), "lsn", pc.fill_null(out["lsn"], -1)
        )
        out = out.append_column("_invalid", pc.invert(kept_valid))
        return with_bucket(out, num_buckets)

    return prep


class PartitionMerger:
    """Per-partition merger. Instantiated either once on the driver and
    shipped as a task closure (default: zero startup cost, snapshot
    computed once and broadcast via the closure), or as a stateful
    actor pool (`cfg.merge_concurrency`) where each actor builds the
    snapshot once in __init__ — the broadcast-small-side pattern
    (reference: the dim-table dicts built before streaming,
    scripts/individual_support.py:17-27). Prefer the actor pool when
    the snapshot is large (many partitions on a big cluster) and
    per-task shipping would dominate."""

    def __init__(
        self,
        cfg: EngineConfig,
        epoch: int,
        base_epoch: int | None = None,
        backfill_epochs: list[int] | None = None,
    ):
        self.cfg = cfg
        self.epoch = epoch
        self.backfill_epochs = backfill_epochs
        # base_epoch: last epoch whose commits form the input lake view
        # (epoch-1 for a single-epoch apply; min(folded)-1 for a fold).
        # The view is the base+delta file CHAIN per partition
        # (merge-on-read; a pure-CoW history is a one-file chain).
        # A BACKFILL (epochs below the committed frontier) folds onto
        # the FULL current view — the higher base's rows must be in the
        # input or the commit would supersede them away.
        self.prev_files: dict[int, list[str]] = manifest.partition_view(
            cfg,
            up_to_epoch=(
                None
                if backfill_epochs is not None
                else (epoch - 1 if base_epoch is None else base_epoch)
            ),
        )
        # backfill watermark floor: the superseded snapshot records'
        # watermarks (the merged state's max _lsn can miss an
        # already-compacted-away max-LSN tombstone — see _stamp_backfill)
        self.prev_wm: dict[int, int] = (
            {
                b: r["lsn_watermark"]
                for b, r in manifest.snapshot(cfg).items()
            }
            if backfill_epochs is not None
            else {}
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group["bucket"][0].as_py())
        record = merge_and_commit(
            self.cfg,
            self.epoch,
            bucket,
            self.prev_files.get(bucket),
            group.drop_columns(["bucket"]),
            compaction=self.backfill_epochs is not None,
            backfill_epochs=self.backfill_epochs,
            prev_watermark=self.prev_wm.get(bucket),
        )
        return _lineage_row(record)


def merge_and_commit(
    cfg: EngineConfig,
    epoch: int,
    bucket: int,
    prev_files: list[str] | None,
    events: pa.Table,
    *,
    compaction: bool = False,
    backfill_epochs: list[int] | None = None,
    prev_watermark: int | None = None,
) -> dict:
    """The per-partition reduce: global LWW compact of this bucket's
    delta, merge against the lake partition, atomic file write,
    idempotent manifest commit. Shared by the Dataset groupby path and
    the direct exchange (lakecdc.exchange). `events` carries the
    `_invalid` marker column from the prep stage.

    ``compaction=True`` is the out-of-order BACKFILL commit: epochs
    applied below an already-committed higher epoch fold onto the full
    current view and land in the compaction-record namespace of the
    frontier epoch (a compaction record supersedes that epoch's apply
    records by scan order), so the backfilled rows become visible
    instead of being superseded away by the higher base.
    ``backfill_epochs`` records which WAL epochs the commit folded; a
    re-run with the same (or a subset of the) epoch set no-ops
    idempotently, while a DIFFERENT backfill hitting an occupied slot
    raises instead of silently dropping its events."""
    existing = manifest.read_record(cfg, epoch, bucket, compaction=compaction)
    if existing is not None:
        if compaction and not set(backfill_epochs or []) <= set(
            existing.get("backfill_epochs", [])
        ):
            what = (
                f"a prior backfill of epochs {existing['backfill_epochs']}"
                if existing.get("backfill_epochs")
                else "a maintenance compaction"
            )
            raise RuntimeError(
                f"partition {bucket}'s compaction slot at epoch {epoch} is "
                f"already held by {what}; cannot commit a different backfill "
                f"{sorted(backfill_epochs or [])} into the same slot — drain "
                "ALL below-frontier epochs in one apply_pending call (never "
                "epoch-by-epoch), and only compact with an explicit as_epoch "
                "once no WAL epoch is pending"
            )
        return existing  # resume/retry: no-op

    n_invalid = pc.sum(pc.cast(events["_invalid"], pa.int64())).as_py() or 0
    events = events.filter(
        pc.fill_null(pc.invert(events["_invalid"]), False)
    ).drop_columns(["_invalid"])
    if cfg.merge_engine == "partial":
        return _merge_and_commit_partial(
            cfg,
            epoch,
            bucket,
            prev_files,
            events,
            n_invalid,
            compaction=compaction,
            backfill_epochs=backfill_epochs,
            prev_watermark=prev_watermark,
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

    kind = "base"
    if cfg.write_mode == "mor" and prev_files and not compaction:
        # Merge-on-read: persist only the compacted delta (as physical
        # lake rows, tombstones included); the fold with the base
        # happens on read / at compaction. No base read, no rewrite —
        # O(delta) I/O per partition per epoch. (A backfill commit is
        # always a full CoW base: a compaction record must supersede
        # the chain it folded.)
        from lakecdc.merge import events_to_lake_rows

        merged = events_to_lake_rows(delta)
        if "source" not in delta.column_names:
            merged = conform(merged, _LAKE_FILE_SCHEMA_V0)
        live = pc.sum(pc.cast(pc.invert(merged["_deleted"]), pa.int64())).as_py() or 0
        stats = {"rows_live": int(live), "rows_tombstoned": merged.num_rows - int(live)}
        kind = "delta"
    else:
        if prev_files:
            lake_tbl = unify_concat(
                [pq.read_table(f) for f in prev_files], LAKE_FILE_SCHEMA
            )
        else:
            lake_tbl = None
        evolved = "source" in delta.column_names or (
            lake_tbl is not None and "source" in lake_tbl.column_names
        )
        target = LAKE_FILE_SCHEMA if evolved else _LAKE_FILE_SCHEMA_V0
        merged, stats = merge_partition(lake_tbl, delta, schema=target)

    path = (
        cfg.partition_compact_file(bucket, epoch)
        if compaction
        else cfg.partition_epoch_file(bucket, epoch)
    )
    atomic_write(
        path,
        lambda tmp: pq.write_table(
            merged,
            tmp,
            row_group_size=cfg.max_rows_per_file,
            **lake_write_options(merged.schema),
        ),
    )
    bytes_written = os.path.getsize(path)

    record = {
        "epoch": epoch,
        "partition": bucket,
        "kind": kind,
        "lsn_watermark": lsn_hi,
        "files": [path],
        "key_range": _key_range(merged),
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
    if compaction:
        _stamp_backfill(record, backfill_epochs, merged, prev_watermark)
    manifest.commit(cfg, record)
    return record


def _stamp_backfill(
    record: dict,
    backfill_epochs: list[int] | None,
    merged: pa.Table,
    prev_watermark: int | None,
) -> None:
    """Mark a backfill commit: compaction namespace, folded-epoch list,
    and a watermark covering EVERYTHING the fold's output contains —
    the folded view spans every prior epoch's rows for this partition
    (not just the frontier epoch's), so max the watermark over the
    merged state's _lsn AND the superseded snapshot record's watermark
    (round-4 review, two rounds: maxing against the frontier's own
    part record alone regressed untouched-at-frontier partitions; the
    merged _lsn alone can still miss an already-compacted-away max-LSN
    tombstone, which only the prior record's watermark remembers)."""
    record["compaction"] = True
    record["backfill_epochs"] = sorted(backfill_epochs or [])
    if merged.num_rows:
        record["lsn_watermark"] = max(
            record["lsn_watermark"],
            pc.max(merged["_lsn"]).as_py(),
        )
    if prev_watermark is not None:
        record["lsn_watermark"] = max(record["lsn_watermark"], prev_watermark)


def _key_range(merged: pa.Table) -> list[str] | None:
    """Zone map for the written file: [min_doc_id, max_doc_id]. Merge
    outputs are key-sorted, so this is O(1). lookup() skips chain
    files whose range can't contain a requested key."""
    if merged.num_rows == 0:
        return None
    return [merged["doc_id"][0].as_py(), merged["doc_id"][-1].as_py()]


def _merge_and_commit_partial(
    cfg: EngineConfig,
    epoch: int,
    bucket: int,
    prev_files: list[str] | None,
    cells: pa.Table,
    n_invalid: int,
    *,
    compaction: bool = False,
    backfill_epochs: list[int] | None = None,
    prev_watermark: int | None = None,
) -> dict:
    """Partial-engine reduce: fold this bucket's cell delta, merge (or
    persist as a merge-on-read delta), atomic write, idempotent commit.
    Same exactly-once contract as the LWW path."""
    from lakecdc.partial import fold_cells, merge_partition_partial
    from lakecdc.schemas import PARTIAL_FILE_SCHEMA

    if cells.num_rows:
        lsn_lo = pc.min(cells["_lsn"]).as_py()
        lsn_hi = pc.max(cells["_lsn"]).as_py()
    else:
        lsn_lo = lsn_hi = -1
    delta = fold_cells(cells)
    n_del = pc.sum(pc.cast(delta["_deleted"], pa.int64())).as_py() or 0
    n_up = delta.num_rows - n_del

    kind = "base"
    if cfg.write_mode == "mor" and prev_files and not compaction:
        merged = delta
        live = pc.sum(pc.cast(pc.invert(merged["_deleted"]), pa.int64())).as_py() or 0
        stats = {"rows_live": int(live), "rows_tombstoned": merged.num_rows - int(live)}
        kind = "delta"
    else:
        if prev_files:
            lake_tbl = unify_concat(
                [pq.read_table(f) for f in prev_files], PARTIAL_FILE_SCHEMA
            )
        else:
            lake_tbl = None
        merged, stats = merge_partition_partial(lake_tbl, delta)

    path = (
        cfg.partition_compact_file(bucket, epoch)
        if compaction
        else cfg.partition_epoch_file(bucket, epoch)
    )
    atomic_write(
        path,
        lambda tmp: pq.write_table(
            merged,
            tmp,
            row_group_size=cfg.max_rows_per_file,
            **lake_write_options(merged.schema),
        ),
    )
    record = {
        "epoch": epoch,
        "partition": bucket,
        "kind": kind,
        "lsn_watermark": lsn_hi,
        "files": [path],
        "key_range": _key_range(merged),
        "lineage": {
            "lsn_lo": lsn_lo,
            "lsn_hi": lsn_hi,
            "rows_upserted": int(n_up),
            "rows_deleted": int(n_del),
            "rows_invalid": int(n_invalid),
            "bytes_written": int(os.path.getsize(path)),
            "rows_live": stats["rows_live"],
            "rows_tombstoned": stats["rows_tombstoned"],
        },
    }
    if compaction:
        _stamp_backfill(record, backfill_epochs, merged, prev_watermark)
    manifest.commit(cfg, record)
    return record


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
    return apply_epochs(cfg, [epoch])


def _backfill_plan(
    cfg: EngineConfig, epochs: list[int]
) -> tuple[list[int], int, list[int] | None]:
    """Shared out-of-order plan for BOTH apply engines (round-4 review
    fix, confirmed silent-loss repro): when an epoch ABOVE this fold's
    commit epoch already has commits (an out-of-order apply ran first),
    committing a base at the lower epoch would be superseded by the
    higher base in manifest scan order and the folded rows would
    silently vanish. Instead: expand the fold to EVERY incomplete
    epoch up to AND INCLUDING the frontier (the frontier epoch itself
    may be a crashed partial apply — its remaining events must join
    this fold, or a later resume of it would commit part records the
    backfill's compact record blinds; the frontier epoch has exactly
    one compaction slot per partition, so the backfill must happen as
    one fold), fold onto the FULL current view, and commit into the
    frontier epoch's compaction-record slot, which supersedes its
    apply records. Returns (epochs, commit_epoch, backfill_epochs) —
    backfill_epochs is None on the normal path.

    The frontier may also sit INSIDE the fold (frontier == max(epochs),
    e.g. apply_epoch(2) then apply_epochs([0, 1, 2])): the frontier
    epoch already has committed part records, so on the normal path
    those partitions would no-op and the lower epochs' rows would be
    silently superseded, then sealed by mark_epoch_complete (round-5
    review fix, confirmed 32-vs-38-row repro on both engines). Any
    fold that carries an incomplete epoch BELOW the frontier must take
    the backfill path; a fold whose only incomplete epoch IS the
    frontier (crashed partial apply being resumed alone) stays on the
    normal path — its part-record slots resume idempotently."""
    epochs = sorted(epochs)
    epoch = epochs[-1]
    frontier = manifest.resume_point(cfg)
    if frontier >= epoch and any(
        e < frontier and not manifest.epoch_complete(cfg, e)
        for e in epochs
    ):
        epochs = sorted(
            set(epochs)
            | {
                e
                for e in wal.list_epochs(cfg)
                if e <= frontier and not manifest.epoch_complete(cfg, e)
            }
        )
        return epochs, frontier, list(epochs)
    return epochs, epoch, None


def apply_epochs(cfg: EngineConfig, epochs: list[int]) -> pa.Table:
    """Apply a RANGE of WAL epochs in ONE pipeline (one read, one
    shuffle, one merge+commit per partition), committed under the
    max epoch number.

    Correct because LWW is order-independent: the merge keeps the
    max-LSN event per key wherever it appears, and tombstones are
    retained, so folding k epochs into one apply converges to the same
    state as k sequential applies (asserted against the oracle in
    tests). Folding is the micro-batch knob of a real CDC tailer —
    fixed per-pipeline costs (shuffle barriers, commit round-trips)
    amortize over more events, which is what the scaling bench
    measures.

    Mixed schema versions across the fold (pre/post `source` evolution)
    are unified at the read by null-backfill (`schema=WAL_SCHEMA_V1`).
    """
    if not epochs:
        return LINEAGE_SCHEMA.empty_table()
    cfg.save_meta()  # pin/validate the lake's physical parameters
    epochs, epoch, backfill = _backfill_plan(cfg, epochs)
    if len(epochs) == 1:
        ds = wal.read_segment(cfg, epochs[0])
    else:
        import glob as _glob

        import ray.data as rd

        from lakecdc.schemas import WAL_SCHEMA_V1

        files = [
            f
            for e in epochs
            for f in sorted(
                _glob.glob(os.path.join(wal.epoch_dir(cfg, e), "*.parquet"))
            )
        ]
        if not files:
            # all-empty fold (crashed writer left segment-less epoch
            # dirs): still mark complete below via the empty dataset
            # path — read_parquet([]) would raise.
            for e in epochs:
                manifest.mark_epoch_complete(cfg, e)
            return LINEAGE_SCHEMA.empty_table()
        ds = rd.read_parquet(files, schema=WAL_SCHEMA_V1)
    # No batch_size: each parquet block is one prep task, so the stage
    # fans out to every core instead of coalescing into a few bundles
    # (batch-local compaction works at any granularity — LWW is a
    # semigroup, the global per-bucket compact finishes the job).
    ds = ds.map_batches(
        make_prep_fn(cfg.num_buckets, cfg.merge_engine),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # Base view as of the COMMIT epoch - 1, not epochs[0] - 1: a fold
    # over a non-contiguous pending list (an epoch inside the span was
    # already applied out of order) must keep that committed epoch's
    # rows in the input view, or the fold's base supersedes them away.
    # For the normal contiguous case the two are identical — pending
    # epochs have no manifest records. Folded epochs' own partial
    # commits (crashed earlier run) are idempotent under LWW re-merge.
    base_epoch = epoch - 1
    if cfg.merge_concurrency:
        # Stateful actor pool: each actor scans the manifest once in
        # __init__ (amortized over many partitions per actor).
        lineage_ds = ds.groupby("bucket").map_groups(
            PartitionMerger,
            fn_constructor_args=(cfg, epoch, base_epoch, backfill),
            batch_format="pyarrow",
            concurrency=cfg.merge_concurrency,
        )
    else:
        # Task pool with the snapshot computed ONCE here and broadcast
        # via the closure — no per-epoch actor startup.
        merger = PartitionMerger(cfg, epoch, base_epoch, backfill)

        def merge_group(group: pa.Table) -> pa.Table:
            return merger(group)

        lineage_ds = ds.groupby("bucket").map_groups(
            merge_group, batch_format="pyarrow"
        )
    rows = lineage_ds.take_all()  # one row per partition — metadata-sized
    # Every touched partition is now committed: record completion so
    # compaction can distinguish "untouched partition" from "apply
    # crashed before committing" (lakecdc.compact guard). EVERY epoch
    # of the fold gets its marker (the fold processed them all), so
    # apply_pending can skip exactly the applied epochs — a crash
    # before this point leaves no markers and the whole fold re-runs.
    for e in epochs:
        manifest.mark_epoch_complete(cfg, e)
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)


def fold_chunks(epochs: list[int], fold: int, apply_fn) -> pa.Table:
    """Chunk ``epochs`` into ``fold``-sized folds and concat the
    lineage — THE shared driver loop of apply_pending/apply_all on
    both engines (the fold semantics live in apply_epochs[_direct];
    this is only the chunk-and-concat)."""
    step = max(fold, 1)
    tables = [
        apply_fn(epochs[i : i + step]) for i in range(0, len(epochs), step)
    ]
    if not tables:
        return LINEAGE_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def pending_epochs(cfg: EngineConfig) -> list[int]:
    """WAL epochs with no completion marker — the apply frontier. Cost
    is one manifest-directory stat per epoch, never an event read."""
    return [e for e in wal.list_epochs(cfg) if not manifest.epoch_complete(cfg, e)]


def apply_pending(cfg: EngineConfig, fold: int = 1) -> pa.Table:
    """The tailer's hot path: apply only the epochs whose completion
    marker is absent — O(new data) per call regardless of how long the
    WAL has grown (a 100-TB lake's tail tick must never re-read the
    whole WAL). ``apply_all`` below remains the deep-resync / repair
    path: it re-applies everything (committed partitions no-op
    byte-identically), which is what you want after manually clearing
    manifest records, never per poll."""
    return _plan_apply(cfg, pending_epochs(cfg), fold, lambda es: apply_epochs(cfg, es))


def _plan_apply(
    cfg: EngineConfig, epochs: list[int], fold: int, apply_fn
) -> pa.Table:
    """Shared apply plan for both engines' apply_all / apply_pending:
    any INCOMPLETE epochs BELOW the committed frontier (an out-of-order
    apply ran ahead) go in ONE backfill fold — the frontier epoch has
    exactly one compaction slot per partition, so chunking them would
    collide on it — then the remaining epochs chunk by ``fold`` as
    usual (already-complete epochs no-op on their existing records)."""
    frontier = manifest.resume_point(cfg)
    below = [
        e
        for e in epochs
        if e < frontier and not manifest.epoch_complete(cfg, e)
    ]
    rest = [e for e in epochs if e not in set(below)]
    tables = []
    if below:
        tables.append(apply_fn(sorted(below)))
        # the backfill fold absorbs every incomplete epoch up to AND
        # including the frontier (_backfill_plan): re-running the
        # now-complete frontier epoch would double-count its events in
        # lineage and write immediately-superseded files, so keep only
        # epochs still incomplete after the backfill
        rest = [e for e in rest if not manifest.epoch_complete(cfg, e)]
    tables.append(fold_chunks(rest, fold, apply_fn))
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return LINEAGE_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def apply_all(
    cfg: EngineConfig, max_epoch: int | None = None, fold: int = 1
) -> pa.Table:
    """Tail the WAL: apply every epoch present, in order, folding
    ``fold`` epochs per pipeline (micro-batch size; see apply_epochs).
    This is the `run_all.py` analogue — a full replay (resync); for
    the incremental tail tick use ``apply_pending``."""
    epochs = [
        e
        for e in wal.list_epochs(cfg)
        if max_epoch is None or e <= max_epoch
    ]
    return _plan_apply(cfg, epochs, fold, lambda es: apply_epochs(cfg, es))
