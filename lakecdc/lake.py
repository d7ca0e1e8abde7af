"""Lake read path.

The current lake = per partition, the manifest's file CHAIN (latest
base + subsequent merge-on-read deltas; a pure copy-on-write history is
a one-file chain). The read LWW-merges the chain per partition —
partitions are disjoint by doc_id, so each partition merges
independently in its own task, no shuffle.

Files may be at different schema-evolution stages (pre-evolution
partitions lack `source`); the read unifies them by null-backfill —
the ``_safe_read_csv`` analogue (scripts/merge_support.py:17-36).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from lakecdc import manifest
from lakecdc.config import EngineConfig
from lakecdc.evolve import unify_concat
from lakecdc.merge import last_per_key
from lakecdc.schemas import LAKE_FILE_SCHEMA, LAKE_SCHEMA


def lake_files(cfg: EngineConfig, up_to_epoch: int | None = None) -> list[str]:
    view = manifest.partition_view(cfg, up_to_epoch)
    return [f for files in view.values() for f in files]


def _merge_chain(
    files: list[str],
    include_meta: bool,
    engine: str = "lww",
    columns: list[str] | None = None,
    keep_tombstones: bool = False,
) -> pa.Table:
    """Fold one partition's file chain into its live rows (LWW
    last-per-key, or the partial engine's per-field fold + visibility).

    ``columns`` prunes USER columns at the parquet read: the fold needs
    only the merge-metadata columns, so e.g. a stats query over
    (doc_id, n_tok) never reads the token payload bytes — the column
    pruning that matters at 100 TB, where tokens dominate file size.
    """
    if engine == "partial":
        # the partial fold needs every cell column; no pruned variant
        from lakecdc.partial import fold_cells, live_view
        from lakecdc.schemas import PARTIAL_FILE_SCHEMA

        cells = fold_cells(
            unify_concat(
                [pq.read_table(f, use_threads=False) for f in files],
                PARTIAL_FILE_SCHEMA,
            )
        )
        out = cells if include_meta else live_view(cells)
        if columns is not None and not include_meta:
            keep = ["doc_id"] + [c for c in columns if c != "doc_id"]
            out = out.select([c for c in out.column_names if c in keep])
        return out
    if columns is None:
        schema = LAKE_FILE_SCHEMA
        tables = [pq.read_table(f, use_threads=False) for f in files]
    else:
        want = set(columns) | {"doc_id", "_lsn", "_deleted"}  # fold columns
        schema = pa.schema([f for f in LAKE_FILE_SCHEMA if f.name in want])
        tables = []
        for f in files:
            avail = set(pq.ParquetFile(f).schema_arrow.names)
            tables.append(
                pq.read_table(
                    f,
                    use_threads=False,
                    columns=[x.name for x in schema if x.name in avail],
                )
            )
    table = unify_concat(tables, schema)
    table = last_per_key(table, key="doc_id", order="_lsn")
    if not keep_tombstones:
        table = table.filter(pc.invert(table["_deleted"]))
    if not include_meta:
        keep = (
            [f.name for f in LAKE_SCHEMA]
            if columns is None
            else ["doc_id"] + [c for c in columns if c != "doc_id"]
        )
        table = table.select([c for c in keep if c in table.column_names])
    return table


def read_lake(
    cfg: EngineConfig,
    up_to_epoch: int | None = None,
    include_meta: bool = False,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """The live lake as a lazy Dataset: one read+merge task per
    partition (tombstones applied, metadata columns dropped unless
    ``include_meta``). ``up_to_epoch`` gives time travel to any past
    committed epoch; ``columns`` prunes user columns AT THE PARQUET
    READ (a (doc_id, n_tok) scan never reads token bytes)."""
    view = manifest.partition_view(cfg, up_to_epoch)
    if columns is None:
        empty = LAKE_FILE_SCHEMA if include_meta else LAKE_SCHEMA
    else:
        keep = {"doc_id"} | set(columns)
        empty = pa.schema([f for f in LAKE_SCHEMA if f.name in keep])
    if not view:
        return rd.from_arrow(empty.empty_table())
    parts = rd.from_items(
        [{"files": files} for files in view.values()]
    )

    engine = cfg.merge_engine

    def load(batch: pa.Table) -> pa.Table:
        tables = [
            _merge_chain(list(files), include_meta, engine, columns)
            for files in batch["files"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else empty.empty_table()

    return parts.map_batches(load, batch_size=1, batch_format="pyarrow")


def _prune_chain(entries: list[dict], wanted: list[str]) -> list[str]:
    """Zone-map skip: keep only chain files whose [lo, hi] key range
    can contain a requested key (unknown range => keep). Correct
    because the per-key fold ignores files holding none of the
    requested keys."""
    keep: list[str] = []
    for e in entries:
        kr = e.get("key_range")
        if kr is None or any(kr[0] <= k <= kr[1] for k in wanted):
            keep.extend(e["files"])
    return keep


def lookup(
    cfg: EngineConfig,
    doc_ids: list[str],
    up_to_epoch: int | None = None,
) -> pd.DataFrame:
    """Point lookup with PARTITION + FILE PRUNING: hash the requested
    keys to their buckets, read only those partitions' chains, and
    within a chain skip files whose manifest zone map ([min, max]
    doc_id) excludes every requested key — a lookup of k keys touches
    at most k partitions and only the overlapping files of each.
    (The same pruning a 100 TB cluster relies on: bucket = the one
    partitioning key, so routing is metadata-only.)"""
    from lakecdc.shuffle import bucket_of

    if not doc_ids:
        return LAKE_SCHEMA.empty_table().to_pandas()
    wanted = sorted(set(doc_ids))
    ids = pa.array(wanted)
    bucket_arr = bucket_of(ids, cfg.num_buckets)
    chains = manifest.partition_chain_stats(cfg, up_to_epoch)
    tables = []
    for b in sorted(set(bucket_arr.tolist())):
        entries = chains.get(b)
        if not entries:
            continue
        in_bucket = [w for w, bb in zip(wanted, bucket_arr) if bb == b]
        files = _prune_chain(entries, in_bucket)
        if not files:
            continue
        t = _merge_chain(files, include_meta=False, engine=cfg.merge_engine)
        t = t.filter(pc.is_in(t["doc_id"], value_set=ids))
        if t.num_rows:
            tables.append(t)
    if not tables:
        return LAKE_SCHEMA.empty_table().to_pandas()
    df = pa.concat_tables(tables).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def read_lake_local(
    cfg: EngineConfig, up_to_epoch: int | None = None
) -> pd.DataFrame:
    """Driver-side read for TESTS and small checks only (materializes).
    The production path is ``read_lake`` (streaming)."""
    view = manifest.partition_view(cfg, up_to_epoch)
    if not view:
        return LAKE_SCHEMA.empty_table().to_pandas()
    tables = [
        _merge_chain(files, include_meta=False, engine=cfg.merge_engine)
        for files in view.values()
    ]
    df = pa.concat_tables(tables).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)
