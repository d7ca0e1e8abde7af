"""Hash partitioning, hot-key detection, and the two-phase merge plan.

The one true shuffle in the engine is the WAL-delta -> lake-partition
exchange keyed by ``hash(doc_id) % num_buckets``. Everything else
(manifest, lineage, resume, compaction) reuses the same bucket id, so
data is only ever co-located once.

Skew: LWW ("keep the max-lsn event per key") is a semigroup, so the
classic combiner trick applies — phase 1 compacts each *batch* locally
(lakecdc.merge.compact_events), after which a hot key contributes at
most one surviving row per batch to the shuffle regardless of how many
events hit it. That is the salting-equivalent for an idempotent merge:
instead of salting `(doc_id, salt)` sub-keys and re-merging, the local
merge already collapses the hot key, and the global per-bucket merge
sees bounded input. `hot_key_stats` exposes the per-batch frequency
census used to verify the bound (and to report skew in lineage).

Reference analogue: per-chunk group-sum + dict accumulate
(scripts/superpac_ie_support.py:104-106) is the same two-phase
local/global pattern for a commutative aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bucket_of(doc_ids: pa.Array | pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    """Deterministic, process-independent bucket assignment.

    Uses pandas' SipHash-based ``hash_array`` with a fixed key — stable
    across processes, Python versions, and nodes (unlike builtin
    ``hash`` under PYTHONHASHSEED).
    """
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    values = np.asarray(doc_ids.to_pandas(), dtype=object)
    hashed = pd.util.hash_array(values, hash_key="lakecdc_bucket00")  # fixed 16-byte key
    return (hashed % np.uint64(num_buckets)).astype(np.int32)


def with_bucket(table: pa.Table, num_buckets: int, key: str = "doc_id") -> pa.Table:
    """Append the `bucket` partition column."""
    return table.append_column("bucket", pa.array(bucket_of(table[key], num_buckets)))


def hot_key_stats(table: pa.Table, key: str = "doc_id", threshold: int = 1000) -> dict:
    """Per-batch key-frequency census: how many keys exceed `threshold`
    events in this batch, and the max multiplicity. Cheap (one
    value_counts) and used only for skew reporting — correctness never
    depends on it because the local compaction bound holds for every
    key."""
    if table.num_rows == 0:
        return {"hot_keys": 0, "max_multiplicity": 0}
    counts = table[key].to_pandas().value_counts()
    return {
        "hot_keys": int((counts > threshold).sum()),
        "max_multiplicity": int(counts.iloc[0]) if len(counts) else 0,
    }
