"""Arrow schemas for the lake, the WAL, the manifest and lineage.

Reference analogue: the fixed positional schemas in
``scripts/config.py:102-124`` — schemas here are likewise explicit and
externally imposed (BASELINE.json input_hint), never inferred.
"""

from __future__ import annotations

import pyarrow as pa

# User-facing lake schema (BASELINE.json input_hint).
LAKE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# Physical lake-file schema: user columns + merge metadata. `_lsn` makes
# the LWW merge order-independent across epochs/replays; `_deleted`
# keeps tombstones resident until compaction so a replayed lower-LSN
# event can never resurrect a deleted key.
LAKE_FILE_SCHEMA = pa.schema(
    list(LAKE_SCHEMA)
    + [
        ("_lsn", pa.int64()),
        ("_deleted", pa.bool_()),
    ]
)

# WAL v0 (pre schema evolution: no `source` column).
WAL_SCHEMA_V0 = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
    ]
)

# WAL v1: additive evolution adds `source`. Old segments/lake files are
# null-backfilled on read (lakecdc.evolve), the `_safe_read_csv`
# analogue of scripts/merge_support.py:17-36.
WAL_SCHEMA_V1 = pa.schema(list(WAL_SCHEMA_V0) + [("source", pa.string())])

# Physical lake-file schema for the PARTIAL-UPDATE merge engine
# (merge_engine="partial"): per-field writer LSNs make the per-field
# last-writer fold order-independent (each component is an argmax /
# max, so the fold is associative); `_del_lsn` records the newest
# delete, and field visibility (field_lsn > _del_lsn) plus row
# liveness (_lsn > _del_lsn) are applied at READ time, keeping the
# stored state a pure semigroup fold.
PARTIAL_FILE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("_lsn", pa.int64()),
        ("_del_lsn", pa.int64()),
        ("_tokens_lsn", pa.int64()),
        ("_source_lsn", pa.int64()),
        ("_deleted", pa.bool_()),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("epoch", pa.int64()),
        ("partition", pa.int32()),
        ("lsn_watermark", pa.int64()),
        ("files", pa.list_(pa.string())),
        ("committed_seq", pa.int64()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("epoch", pa.int64()),
        ("partition", pa.int32()),
        ("lsn_lo", pa.int64()),
        ("lsn_hi", pa.int64()),
        ("rows_upserted", pa.int64()),
        ("rows_deleted", pa.int64()),
        ("rows_invalid", pa.int64()),
        ("bytes_written", pa.int64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
