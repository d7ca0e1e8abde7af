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


def wal_write_options(schema: pa.Schema) -> dict:
    """Parquet writer options for WAL segments, chosen by measurement
    (BASELINE.md round 4): sequential int64 log columns delta-pack
    ~2000x (`lsn` 300 KB -> 138 B per 50k-row segment, ~8-12% of WAL
    bytes — less DRAM streamed per decode); token payloads are ALREADY
    near-entropy under pyarrow's default dictionary encoding (~16.5
    bits/token vs DELTA_BINARY_PACKED's ~18), but a use_dictionary
    LIST silently demotes unlisted columns to PLAIN (32 bits/token!),
    so every integer column gets an explicit delta encoding. Keys are
    intersected with the actual schema so v0 (no `source`) and future
    evolutions write with the same call."""
    names = set(schema.names)
    dict_cols = [c for c in ("op", "doc_id", "source") if c in names]
    enc = {
        c: "DELTA_BINARY_PACKED"
        for c in ("lsn", "n_tok")
        if c in names
    }
    if "tokens" in names:
        enc["tokens.list.element"] = "DELTA_BINARY_PACKED"
    return {
        "use_dictionary": dict_cols,
        "column_encoding": enc,
        "version": "2.6",
    }


def lake_write_options(schema: pa.Schema) -> dict:
    """Parquet writer options for LAKE partition files (apply merge,
    compaction). Same delta-packed integer discipline as the WAL
    (`_lsn`/per-field LSNs/`n_tok`/token payloads — the merge and
    read paths are DRAM-bandwidth-bound, and delta decode streams
    fewer bytes), but dictionary encoding ONLY on the low-cardinality
    `source` column: lake `doc_id` is UNIQUE per row (one live row per
    key after LWW), where a dictionary stores every value once PLUS an
    index — pure inflation, the opposite of the WAL case where Zipf
    doc_ids repeat across events."""
    names = set(schema.names)
    enc = {
        c: "DELTA_BINARY_PACKED"
        for c in ("n_tok", "_lsn", "_del_lsn", "_tokens_lsn", "_source_lsn")
        if c in names
    }
    if "tokens" in names:
        enc["tokens.list.element"] = "DELTA_BINARY_PACKED"
    return {
        "use_dictionary": [c for c in ("source",) if c in names],
        "column_encoding": enc,
        "version": "2.6",
    }
