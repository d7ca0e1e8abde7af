"""Tombstone compaction + file vacuum.

In copy-on-write mode a partition's latest epoch file IS the whole
partition; in merge-on-read mode the partition is a base + delta file
chain. Compaction does two things:

1. **Chain fold + tombstone compaction**: LWW-fold each partition's
   base+delta chain (merge-on-read mode leaves deltas behind) into a
   single new base, dropping `_deleted` rows whose `_lsn` <= the
   partition's committed watermark (all applied events are <= the
   watermark, so no lower-LSN event can ever arrive to be shielded —
   the tombstone has done its job).
2. **Vacuum**: delete lake files no longer referenced by the current
   snapshot (old epochs), bounding storage. Explicit and separate,
   because removing them forfeits time travel.

Implemented as raw Ray tasks, one per partition — this is the
"almost never" case where the Dataset API is the wrong fit: the unit of
work is a partition (file set + manifest record), not a row stream.

Reference analogue: ``combine_csv.py`` (cross-run concat + exact dedup
+ report) is the reference's only cross-run maintenance operator.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from lakecdc import manifest
from lakecdc.config import EngineConfig, atomic_write
from lakecdc.evolve import unify_concat
from lakecdc.schemas import LAKE_FILE_SCHEMA, lake_write_options


class PendingWalError(RuntimeError):
    """compact()'s refuse-while-WAL-pending guard — typed so callers
    (maybe_compact) can skip exactly this condition without swallowing
    real failures whose message happens to contain similar text."""


@ray.remote
def _compact_partition(
    cfg: EngineConfig,
    bucket: int,
    files: list,
    watermark: int,
    as_epoch: int,
    retain_ids: list[str] | None = None,
) -> dict:
    if manifest.is_committed(cfg, as_epoch, bucket, compaction=True):
        return manifest.read_record(cfg, as_epoch, bucket, compaction=True)["lineage"]
    if cfg.merge_engine == "partial":
        from lakecdc.evolve import unify_concat as _uc
        from lakecdc.partial import fold_cells, normalize_cells
        from lakecdc.schemas import PARTIAL_FILE_SCHEMA

        table = fold_cells(
            unify_concat([pq.read_table(f) for f in files], PARTIAL_FILE_SCHEMA)
        )
        # Rows whose doc_id still sits in the dead-letter quarantine
        # keep their FULL cell state (delete fences intact): a later
        # repair+resubmit re-enters LWW order with its ORIGINAL
        # (lower) LSNs, and only the fence stops it from resurrecting
        # deleted state. Everything else compacts as before.
        if retain_ids:
            retain_mask = pc.is_in(
                table["doc_id"], value_set=pa.array(retain_ids)
            )
            retained = table.filter(retain_mask)
            rest = table.filter(pc.invert(retain_mask))
        else:
            retained, rest = None, table
        dropped = pc.sum(pc.cast(rest["_deleted"], pa.int64())).as_py() or 0
        live = normalize_cells(rest)
        if retained is not None and retained.num_rows:
            live = _uc([live, retained], PARTIAL_FILE_SCHEMA)
    else:
        from lakecdc.merge import last_per_key

        table = unify_concat([pq.read_table(f) for f in files], LAKE_FILE_SCHEMA)
        # Fold the base+delta chain (merge-on-read) to current state first.
        table = last_per_key(table, key="doc_id", order="_lsn")
        keep = pc.invert(table["_deleted"])
        if retain_ids:
            # Tombstones for quarantined doc_ids are RETAINED — the
            # lower-LSN repair path needs them (see partial branch).
            keep = pc.or_(
                keep, pc.is_in(table["doc_id"], value_set=pa.array(retain_ids))
            )
        dropped = table.num_rows - (pc.sum(pc.cast(keep, pa.int64())).as_py() or 0)
        live = table.filter(keep)
    path = cfg.partition_compact_file(bucket, as_epoch)
    atomic_write(
        path,
        lambda tmp: pq.write_table(
            live,
            tmp,
            row_group_size=cfg.max_rows_per_file,
            **lake_write_options(live.schema),
        ),
    )
    from lakecdc.apply import _key_range

    record = {
        "epoch": as_epoch,
        "partition": bucket,
        "kind": "base",
        "compaction": True,
        "lsn_watermark": watermark,
        "files": [path],
        "key_range": _key_range(live),
        "lineage": {
            "lsn_lo": -1,
            "lsn_hi": watermark,
            "rows_upserted": 0,
            "rows_deleted": int(dropped),  # tombstones physically removed
            "rows_invalid": 0,
            "bytes_written": int(os.path.getsize(path)),
            # retained quarantine-fence tombstones stay counted as such
            "rows_live": int(
                pc.sum(pc.cast(pc.invert(live["_deleted"]), pa.int64())).as_py() or 0
            ),
            "rows_tombstoned": int(
                pc.sum(pc.cast(live["_deleted"], pa.int64())).as_py() or 0
            ),
        },
    }
    manifest.commit(cfg, record)
    return record["lineage"]


def compact(
    cfg: EngineConfig,
    as_epoch: int | None = None,
    partitions: set[int] | None = None,
) -> dict[int, dict]:
    """Tombstone-compact partitions (all by default, or just
    ``partitions``), committing the rewrites as compaction records at
    epoch ``as_epoch`` (default: the latest committed epoch —
    compaction records have their own namespace and supersede that
    epoch's apply records, so the epoch counter never advances and a
    later WAL epoch with the next number applies normally). Idempotent
    and resumable exactly like an apply.

    Refuses to run while ANY WAL epoch lacks a completion marker —
    including one numbered BELOW the newest commit (an out-of-order
    ``apply_epoch`` call): compacting then would drop tombstones that
    the pending lower-LSN events still need, and fold a chain the
    pending apply still extends. Passing ``as_epoch`` explicitly
    bypasses the guard (caller asserts the chain is final up to that
    epoch); the fold and the watermark are then taken AS OF that
    epoch, so later records never leak into the compacted base.

    Tombstones for doc_ids still present in the dead-letter quarantine
    are retained, not dropped: quarantine is the one sanctioned source
    of lower-than-watermark LSNs (repair + resubmit keeps original
    LSNs), and the retained tombstone is what fences a late repair
    from resurrecting a deleted doc."""
    from lakecdc import wal

    view = manifest.partition_view(cfg, up_to_epoch=as_epoch)
    snap = manifest.snapshot(cfg, up_to_epoch=as_epoch)
    if not view:
        return {}
    if as_epoch is None:
        from lakecdc.apply import pending_epochs

        pending = pending_epochs(cfg)
        if pending:
            raise PendingWalError(
                f"cannot compact: WAL epochs {pending} not applied to completion; "
                "run apply first"
            )
        as_epoch = manifest.resume_point(cfg)
    retain = sorted(wal.quarantined_doc_ids(cfg))
    if partitions is not None:
        view = {b: files for b, files in view.items() if b in partitions}
    # An out-of-order BACKFILL may already occupy a partition's
    # compaction slot at this epoch with an APPLY-fold record — not a
    # maintenance compaction. Skip those partitions honestly (absent
    # from the result) instead of returning the backfill's lineage as
    # if tombstone compaction had run; their chain is already one base
    # and they compact normally at the next epoch (round-4 review).
    backfilled = {
        b
        for b in view
        if (
            r := manifest.read_record(cfg, as_epoch, b, compaction=True)
        )
        is not None
        and r.get("backfill_epochs")
    }
    if backfilled:
        view = {b: f for b, f in view.items() if b not in backfilled}
    futures = {
        b: _compact_partition.remote(
            cfg, b, files, snap[b]["lsn_watermark"], as_epoch, retain or None
        )
        for b, files in view.items()
    }
    return {b: ray.get(f) for b, f in futures.items()}


def maybe_compact(cfg: EngineConfig, max_chain: int) -> dict[int, dict] | None:
    """Auto-compaction policy: fold exactly the partitions whose
    merge-on-read file chain exceeds ``max_chain`` entries (never a
    full-lake rewrite — one hot partition must not trigger
    O(num_buckets) write amplification). The operational knob for
    continuous MOR tailing (CLI ``apply --compact-over N``): applies
    stay O(delta) while read amplification is bounded by N. Returns
    compact()'s result, or None when every chain is within bound or
    when a producer wrote a new WAL epoch since this tick's apply (the
    follow loop's next tick applies it and re-checks — a skipped fold,
    not a crash)."""
    chains = manifest.partition_chain_stats(cfg)
    if not chains:
        return None
    over = {b for b, entries in chains.items() if len(entries) > max_chain}
    if not over:
        return None
    try:
        return compact(cfg, partitions=over)
    except PendingWalError:
        # WAL moved ahead between this tick's apply and now (live
        # producer): skip — compaction is maintenance, never worth
        # killing the tailer over; the next tick retries. ONLY the
        # typed pending-WAL guard is skippable — any other error (incl.
        # RayTaskError-wrapped RuntimeErrors from compaction tasks) is
        # a real failure and must surface, or the chain grows
        # unboundedly while the follow loop retries forever (round-4
        # review finding).
        return None


def vacuum(cfg: EngineConfig, retain_epochs: int = 0) -> list[str]:
    """Delete lake files not referenced by the current snapshot — or,
    with ``retain_epochs=n``, by any as-of view of the last n+1
    committed epochs (a time-travel retention window, the lakehouse
    "vacuum older than" knob). Returns deleted paths."""
    # NB: each reference set is the partition VIEW (base + delta
    # chains), not just each partition's latest record — deleting a
    # still-chained delta file would corrupt merge-on-read state.
    edirs = sorted(
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(os.path.join(cfg.manifest_dir, "epoch=*"))
    )
    as_of_points = [None] if not edirs else [
        e for e in edirs[-(retain_epochs + 1) :]
    ] + [None]
    referenced = {
        os.path.realpath(f)
        for e in as_of_points
        for files in manifest.partition_view(cfg, up_to_epoch=e).values()
        for f in files
    }
    deleted = []
    for f in glob.glob(os.path.join(cfg.lake_dir, "part=*", "epoch=*", "*.parquet")):
        if os.path.realpath(f) not in referenced:
            os.remove(f)
            deleted.append(f)
    return deleted
