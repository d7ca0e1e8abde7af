"""Tombstone compaction + file vacuum.

The epoch merge is copy-on-write (each touched partition is fully
rewritten), so a partition's latest epoch file IS the whole partition;
compaction therefore does two things:

1. **Tombstone compaction**: rewrite each partition dropping `_deleted`
   rows whose `_lsn` <= the partition's committed watermark (all
   applied events are <= the watermark, so no lower-LSN event can ever
   arrive to be shielded — the tombstone has done its job).
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
from lakecdc.config import EngineConfig
from lakecdc.evolve import unify_concat
from lakecdc.schemas import LAKE_FILE_SCHEMA


@ray.remote
def _compact_partition(cfg: EngineConfig, bucket: int, rec: dict, as_epoch: int) -> dict:
    if manifest.is_committed(cfg, as_epoch, bucket):
        return manifest.read_record(cfg, as_epoch, bucket)["lineage"]
    table = unify_concat([pq.read_table(f) for f in rec["files"]], LAKE_FILE_SCHEMA)
    dropped = pc.sum(pc.cast(table["_deleted"], pa.int64())).as_py() or 0
    live = table.filter(pc.invert(table["_deleted"]))
    path = cfg.partition_epoch_file(bucket, as_epoch)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(live, tmp, row_group_size=cfg.max_rows_per_file)
    os.replace(tmp, path)
    record = {
        "epoch": as_epoch,
        "partition": bucket,
        "lsn_watermark": rec["lsn_watermark"],
        "files": [path],
        "lineage": {
            "lsn_lo": -1,
            "lsn_hi": rec["lsn_watermark"],
            "rows_upserted": 0,
            "rows_deleted": int(dropped),  # tombstones physically removed
            "rows_invalid": 0,
            "bytes_written": int(os.path.getsize(path)),
            "rows_live": int(live.num_rows),
            "rows_tombstoned": 0,
        },
    }
    manifest.commit(cfg, record)
    return record["lineage"]


def compact(cfg: EngineConfig, as_epoch: int | None = None) -> dict[int, dict]:
    """Tombstone-compact every partition, committing the rewrites as
    epoch ``as_epoch`` (default: one past the latest committed epoch).
    Idempotent and resumable exactly like an apply."""
    snap = manifest.snapshot(cfg)
    if not snap:
        return {}
    if as_epoch is None:
        as_epoch = manifest.resume_point(cfg) + 1
    futures = {
        b: _compact_partition.remote(cfg, b, rec, as_epoch)
        for b, rec in snap.items()
    }
    return {b: ray.get(f) for b, f in futures.items()}


def vacuum(cfg: EngineConfig) -> list[str]:
    """Delete lake files not referenced by the CURRENT snapshot (drops
    time travel to earlier epochs). Returns deleted paths."""
    referenced = {
        os.path.realpath(f)
        for rec in manifest.snapshot(cfg).values()
        for f in rec["files"]
    }
    deleted = []
    for f in glob.glob(os.path.join(cfg.lake_dir, "part=*", "epoch=*", "*.parquet")):
        if os.path.realpath(f) not in referenced:
            os.remove(f)
            deleted.append(f)
    return deleted
