"""Engine configuration.

Reference analogue: ``scripts/config.py`` (two user knobs + derived
paths, fixed schemas, CHUNKSIZE memory bound). Here the knobs are the
lake/WAL/manifest layout, the bucket count (the one partitioning key
reused across every stage), and the skew/salting thresholds.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """All paths + physical-plan knobs for one lake.

    ``num_buckets`` is the number of hash partitions of the lake by
    ``doc_id``. It is THE layout decision: the WAL shuffle, the lake
    file layout, manifest records, lineage rows and resume granularity
    all share it. At sandbox scale the default is 32; at 100 TB /
    10^10 events on a 256-node cluster you would run the same code
    with num_buckets in the 4096-16384 range so each partition's merge
    state stays in one worker's heap (~tens of GB lake / bucket max).
    """

    root: str
    num_buckets: int = 32
    # Max rows per written lake parquet file (keeps row-groups seekable;
    # a failed partition rewrite never produces one giant file).
    max_rows_per_file: int = 1_000_000
    # WAL batch size for the validate/pre-compact map_batches stage.
    wal_batch_size: int = 65_536
    # A key is "hot" within a batch when it exceeds this many events;
    # hot keys are pre-compacted locally (LWW is a semigroup, so
    # batch-local keep-max-lsn is a lossless combiner) which bounds
    # shuffle volume per key to one row per batch.
    hot_key_batch_threshold: int = 1_000
    # Actor-pool size for stateful merge stages (None -> let Ray size it).
    merge_concurrency: int | None = None
    # Partition write mode: "cow" rewrites the full partition per apply
    # (reads amplify nothing; writes amplify by partition/delta size);
    # "mor" (merge-on-read) writes only the compacted delta per apply
    # and defers the fold to reads/compaction — the right trade for
    # frequent small epochs over a huge lake. Either way the state is
    # the LWW merge of the manifest's file chain, so modes can be mixed
    # freely and compaction always returns to a single base.
    write_mode: str = "cow"
    # Merge engine: "lww" (default) keeps the max-LSN full row per key;
    # "partial" additionally understands op="patch" events that set only
    # their non-null fields (Debezium-style partial images) — per-field
    # last-writer-wins with delete fencing (lakecdc.merge fold_partial).
    merge_engine: str = "lww"
    seed: int = 42

    @property
    def lake_dir(self) -> str:
        return os.path.join(self.root, "lake")

    @property
    def wal_dir(self) -> str:
        return os.path.join(self.root, "wal")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.root, "manifest")

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.root, "lineage")

    def partition_dir(self, bucket: int) -> str:
        return os.path.join(self.lake_dir, f"part={bucket:05d}")

    def partition_epoch_file(self, bucket: int, epoch: int) -> str:
        # Deterministic file name: an idempotent retry of the same
        # (epoch, partition) merge rewrites the identical bytes at the
        # identical path, so exactly-once needs no transactional store.
        return os.path.join(
            self.partition_dir(bucket), f"epoch={epoch:09d}", "data.parquet"
        )

    def partition_compact_file(self, bucket: int, epoch: int) -> str:
        # Compaction output is a distinct file so it never overwrites
        # the same epoch's apply output (compaction commits at the
        # epoch of the last record it folds; see lakecdc.compact).
        return os.path.join(
            self.partition_dir(bucket), f"epoch={epoch:09d}", "compact.parquet"
        )

    def ensure_dirs(self) -> None:
        for d in (self.lake_dir, self.wal_dir, self.manifest_dir, self.lineage_dir):
            os.makedirs(d, exist_ok=True)


# Operation vocabulary of the WAL. insert/update/upsert all carry a full
# payload and mean "set row to payload" under last-writer-wins; delete
# is a tombstone. (Reference analogue: TRANSACTION_TP code routing,
# scripts/superpac_ie_support.py:82 / individual_support.py:94.)
OPS_UPSERT = ("insert", "update", "upsert")
OP_DELETE = "delete"
# "patch" (partial merge engine only): sets ONLY its non-null payload
# fields; null fields inherit current state. A patch after a delete
# resurrects the row with just its fields. Invalid (counted) under the
# default LWW engine.
OP_PATCH = "patch"
VALID_OPS = frozenset(OPS_UPSERT) | {OP_DELETE}
VALID_OPS_PARTIAL = VALID_OPS | {OP_PATCH}
