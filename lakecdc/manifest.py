"""Exactly-once commit log (the manifest).

One JSON record per committed ``(epoch, partition)`` merge at
``manifest/epoch=NNNNNNNNN/part-PPPPP.json``, created atomically via
write-temp + ``os.replace``. A commit of an already-committed pair is a
no-op, and the lake files it would reference are byte-identical
(deterministic merge + deterministic file names), so a retried or
replayed task cannot double-apply: replaying the same change stream
from any checkpoint converges to the identical final state.

The current lake snapshot = for each partition, the record with the
greatest epoch. Resume = re-run the epoch; committed partitions
short-circuit.

At sandbox scale the manifest is a directory scan; on a real cluster it
is the same small file set on shared storage (num_buckets × epochs tiny
JSON files) — the scan is metadata-sized, never data-sized.

Reference analogue: stage-level CSV checkpointing — stages persist
outputs at fixed paths and a rerun reuses them
(scripts/merge_support.py:105-107, config.py:126-141) — hardened into
an atomic per-partition commit protocol.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

from lakecdc.config import EngineConfig


def _record_path(cfg: EngineConfig, epoch: int, partition: int) -> str:
    return os.path.join(
        cfg.manifest_dir, f"epoch={epoch:09d}", f"part-{partition:05d}.json"
    )


def commit(cfg: EngineConfig, record: dict[str, Any]) -> bool:
    """Atomically commit one (epoch, partition) record. Returns True if
    this call created the record, False if it already existed (the
    idempotent re-commit path)."""
    path = _record_path(cfg, record["epoch"], record["partition"])
    if os.path.exists(path):
        return False
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(record, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX
    return True


def read_record(cfg: EngineConfig, epoch: int, partition: int) -> dict | None:
    path = _record_path(cfg, epoch, partition)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def is_committed(cfg: EngineConfig, epoch: int, partition: int) -> bool:
    return os.path.exists(_record_path(cfg, epoch, partition))


def committed_partitions(cfg: EngineConfig, epoch: int) -> set[int]:
    recs = glob.glob(os.path.join(cfg.manifest_dir, f"epoch={epoch:09d}", "part-*.json"))
    return {int(os.path.basename(p).split("-")[1].split(".")[0]) for p in recs}


def snapshot(cfg: EngineConfig, up_to_epoch: int | None = None) -> dict[int, dict]:
    """Current lake view: partition -> its latest committed record
    (optionally as of ``up_to_epoch``, i.e. time travel)."""
    latest: dict[int, dict] = {}
    for edir in sorted(glob.glob(os.path.join(cfg.manifest_dir, "epoch=*"))):
        epoch = int(os.path.basename(edir).split("=")[1])
        if up_to_epoch is not None and epoch > up_to_epoch:
            continue
        for p in glob.glob(os.path.join(edir, "part-*.json")):
            partition = int(os.path.basename(p).split("-")[1].split(".")[0])
            with open(p) as f:
                latest[partition] = json.load(f)  # epochs scanned ascending
    return latest


def latest_files(
    cfg: EngineConfig, partition: int, up_to_epoch: int | None = None
) -> list[str]:
    rec = snapshot(cfg, up_to_epoch).get(partition)
    return rec["files"] if rec else []


def partition_view(
    cfg: EngineConfig, up_to_epoch: int | None = None
) -> dict[int, list[str]]:
    """Per partition, the ordered file chain that constitutes its
    current state: the latest `kind == "base"` record's files followed
    by every later `kind == "delta"` record's files (merge-on-read).
    Records without a `kind` field are bases (copy-on-write history).
    LWW-merging the chain (last_per_key by _lsn) yields the partition.
    """
    chains: dict[int, list[tuple[int, str, list[str]]]] = {}
    for edir in sorted(glob.glob(os.path.join(cfg.manifest_dir, "epoch=*"))):
        epoch = int(os.path.basename(edir).split("=")[1])
        if up_to_epoch is not None and epoch > up_to_epoch:
            continue
        for p in glob.glob(os.path.join(edir, "part-*.json")):
            partition = int(os.path.basename(p).split("-")[1].split(".")[0])
            with open(p) as f:
                rec = json.load(f)
            chains.setdefault(partition, []).append(
                (epoch, rec.get("kind", "base"), rec["files"])
            )
    view: dict[int, list[str]] = {}
    for partition, entries in chains.items():
        entries.sort()
        files: list[str] = []
        for _, kind, fs in entries:
            if kind == "base":
                files = list(fs)  # a base supersedes everything before it
            else:
                files.extend(fs)
        view[partition] = files
    return view


def resume_point(cfg: EngineConfig) -> int:
    """The checkpoint: lowest epoch not fully committed is unknowable
    without the event stream, so resume-by-replay re-runs from the
    first epoch with any missing partition work; committed partitions
    no-op. This returns the max epoch with any commit (or -1)."""
    edirs = glob.glob(os.path.join(cfg.manifest_dir, "epoch=*"))
    if not edirs:
        return -1
    return max(int(os.path.basename(d).split("=")[1]) for d in edirs)
