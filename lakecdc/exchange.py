"""Direct two-phase exchange for the epoch apply — the engine's
scale path.

The Dataset `groupby("bucket")` expresses the same plan, but its
general-purpose sort shuffle moves and re-sorts rows it doesn't need to
(bucket is a precomputed, small-cardinality key): measured on the sf0.1
bench WAL (32M events, 32 cpus) the sort-based groupby apply runs
~20-37s vs ~10-14s for this exchange. Here each row moves exactly
once:

  map task (one per WAL file group): read -> validate + batch-local LWW
      compact (combiner) -> sort by bucket -> slice into num_buckets
      sub-tables, returned as num_buckets separate objects
  reduce task (one per bucket): fetch only its bucket's sub-tables,
      concat -> global LWW compact -> merge vs lake partition ->
      atomic write + idempotent manifest commit (apply.merge_and_commit)

This is a textbook push shuffle built from raw Ray tasks — the
documented "last resort" case where the Dataset API's generic
all-to-all is measurably the bottleneck. Partitioning assumption:
bucket = hash(doc_id) % num_buckets, identical to the lake layout, so
reduce output lands exactly on its partition. Skew is bounded by the
map-side combiner (at most one row per key per map task reaches the
shuffle). On a multi-node cluster the map outputs are plasma objects
fetched point-to-point by reducers — the same data movement a built-in
push shuffle performs.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from lakecdc import manifest, wal
from lakecdc.apply import _backfill_plan, make_prep_fn, merge_and_commit
from lakecdc.config import EngineConfig
from lakecdc.evolve import unify_concat
from lakecdc.schemas import LINEAGE_SCHEMA, PARTIAL_FILE_SCHEMA, WAL_SCHEMA_V1

_WAL_V1_INVALID = pa.schema(
    list(WAL_SCHEMA_V1) + [("_invalid", pa.bool_())]
)
_PARTIAL_INVALID = pa.schema(
    list(PARTIAL_FILE_SCHEMA) + [("_invalid", pa.bool_())]
)


# Map outputs are returned as `RETURN_GROUPS` objects, each ONE
# concatenated Arrow table covering a contiguous range of buckets
# (bucket column retained, rows bucket-sorted). Granularity matters a
# lot, measured at 128M events / 32 cpus:
#   - num_returns=64 (one object per bucket): 64 tiny plasma puts per
#     map task tripled the map phase;
#   - one object per task (tuple of 64 tables): cheap puts, but every
#     reducer then deserializes maps x buckets table handles — ~0.5M
#     deserializations across reducers dominated the run (~45s
#     constant);
#   - G grouped single-table objects: puts stay cheap AND a reducer
#     deserializes exactly one table per map task. Total desers =
#     buckets x maps, payload fetched = only the reducer's group.
# On a multi-node cluster the same layout means a reducer pulls 1/G of
# each map output over the network.
RETURN_GROUPS = 8


@ray.remote
def _map_files(
    files: list[str], num_buckets: int, n_groups: int, merge_engine: str = "lww"
) -> tuple:
    """Read + prep a group of WAL files, split into n_groups
    bucket-range tables (see note above)."""
    prep = make_prep_fn(num_buckets, merge_engine)
    # use_threads=False: tasks are 1-CPU; the default pyarrow pool
    # would oversubscribe 32 readers x N threads.
    tables = [pq.read_table(f, use_threads=False) for f in files]
    t = unify_concat(tables, WAL_SCHEMA_V1)  # null-backfill v0 segments
    t = prep(t)
    t = t.sort_by("bucket")
    b = t["bucket"].to_numpy()
    per = -(-num_buckets // n_groups)
    edges = np.searchsorted(b, np.arange(0, n_groups * per + 1, per))
    out = tuple(
        t.slice(edges[i], edges[i + 1] - edges[i]) for i in range(n_groups)
    )
    return out if n_groups > 1 else out[0]


@ray.remote
def _reduce_bucket(
    cfg: EngineConfig,
    epoch: int,
    bucket: int,
    prev_files: list[str] | None,
    backfill_epochs: list[int] | None,
    prev_watermark: int | None,
    *group_parts: pa.Table,
):
    parts = []
    for gp in group_parts:
        b = gp["bucket"].to_numpy() if gp.num_rows else None
        if b is None:
            continue
        lo, hi = np.searchsorted(b, [bucket, bucket + 1])
        if hi > lo:
            parts.append(gp.slice(lo, hi - lo).drop_columns(["bucket"]))
    if not parts:
        return None  # untouched partition: carry forward, no rewrite
    schema = _PARTIAL_INVALID if cfg.merge_engine == "partial" else _WAL_V1_INVALID
    events = unify_concat(list(parts), schema)
    return merge_and_commit(
        cfg,
        epoch,
        bucket,
        prev_files,
        events,
        compaction=backfill_epochs is not None,
        backfill_epochs=backfill_epochs,
        prev_watermark=prev_watermark,
    )


def apply_epochs_direct(
    cfg: EngineConfig, epochs: list[int], files_per_map: int | None = None
) -> pa.Table:
    """apply.apply_epochs semantics via the direct exchange."""
    if not epochs:
        return LINEAGE_SCHEMA.empty_table()
    cfg.save_meta()  # pin/validate the lake's physical parameters
    # Shared out-of-order backfill plan (see apply._backfill_plan).
    epochs, epoch, backfill = _backfill_plan(cfg, epochs)
    files = [
        f
        for e in epochs
        for f in sorted(glob.glob(os.path.join(wal.epoch_dir(cfg, e), "*.parquet")))
    ]
    if not files:
        # A crashed writer can leave an epoch dir with zero committed
        # segments; mark it complete anyway or it stays in
        # pending_epochs forever and every tail tick re-lists it
        # (round-4 review fix; apply.apply_epochs handles this too).
        for e in epochs:
            manifest.mark_epoch_complete(cfg, e)
        return LINEAGE_SCHEMA.empty_table()
    if files_per_map is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        files_per_map = max(1, len(files) // (4 * cpus))
    groups = [files[i : i + files_per_map] for i in range(0, len(files), files_per_map)]

    B = cfg.num_buckets
    G = min(RETURN_GROUPS, B)
    per = -(-B // G)
    map_out = [
        _map_files.options(num_returns=G if G > 1 else None).remote(
            g, B, G, cfg.merge_engine
        )
        for g in groups
    ]
    if G == 1:
        map_out = [[r] for r in map_out]

    # The prior lake view is the base+delta file CHAIN per partition
    # (partition_view), not just the latest record: over a
    # merge-on-read lake the newest record is only a delta, and a CoW
    # merge seeded from it alone would silently drop all older rows.
    # Commit-epoch-relative base view (see apply.apply_epochs): keeps
    # an out-of-order-committed epoch inside the fold span visible.
    prev = manifest.partition_view(
        cfg, up_to_epoch=None if backfill is not None else epoch - 1
    )
    # backfill watermark floor (see apply._stamp_backfill)
    prev_wm = (
        {b: r["lsn_watermark"] for b, r in manifest.snapshot(cfg).items()}
        if backfill is not None
        else {}
    )
    reduce_out = [
        _reduce_bucket.remote(
            cfg,
            epoch,
            b,
            prev.get(b),
            backfill,
            prev_wm.get(b),
            *[refs[b // per] for refs in map_out],
        )
        for b in range(B)
    ]
    records = [r for r in ray.get(reduce_out) if r is not None]
    # every folded epoch was processed: mark each, so apply_pending /
    # pending_epochs see exactly the applied set (see apply.apply_epochs)
    for e in epochs:
        manifest.mark_epoch_complete(cfg, e)
    from lakecdc.apply import _lineage_row

    if not records:
        return LINEAGE_SCHEMA.empty_table()
    return pa.concat_tables([_lineage_row(r) for r in records])


def apply_all_direct(
    cfg: EngineConfig, max_epoch: int | None = None, fold: int = 1
) -> pa.Table:
    from lakecdc.apply import _plan_apply

    epochs = [
        e for e in wal.list_epochs(cfg) if max_epoch is None or e <= max_epoch
    ]
    return _plan_apply(cfg, epochs, fold, lambda es: apply_epochs_direct(cfg, es))


def apply_pending_direct(cfg: EngineConfig, fold: int = 1) -> pa.Table:
    """apply.apply_pending on the direct-exchange path: the follower's
    tail tick on the scale engine — only epochs without a completion
    marker are read, so one tick costs O(new data) regardless of WAL
    length (apply_all_direct stays the full-replay resync)."""
    from lakecdc.apply import _plan_apply, pending_epochs

    return _plan_apply(
        cfg, pending_epochs(cfg), fold, lambda es: apply_epochs_direct(cfg, es)
    )
