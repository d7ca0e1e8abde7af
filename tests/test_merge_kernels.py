"""Unit tests for the pure-Arrow LWW kernels (no Ray needed)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from lakecdc.evolve import conform, unify_concat
from lakecdc.merge import (
    compact_events,
    events_to_lake_rows,
    last_per_key,
    merge_partition,
    validate_events,
)
from lakecdc.schemas import LAKE_FILE_SCHEMA, WAL_SCHEMA_V0, WAL_SCHEMA_V1


def ev(lsn, op, doc, tokens, source=None, with_source=True):
    row = {
        "lsn": lsn,
        "op": op,
        "doc_id": doc,
        "tokens": tokens,
        "n_tok": None if tokens is None else len(tokens),
    }
    if with_source:
        row["source"] = source
    return row


def events_table(rows, with_source=True):
    schema = WAL_SCHEMA_V1 if with_source else WAL_SCHEMA_V0
    return pa.Table.from_pylist(rows, schema=schema)


def test_last_per_key_keeps_max_lsn():
    t = pa.table(
        {
            "doc_id": ["a", "b", "a", "a", "b"],
            "_lsn": [1, 2, 5, 3, 1],
            "v": [10, 20, 50, 30, 11],
        }
    )
    out = last_per_key(t, order="_lsn")
    got = {r["doc_id"]: (r["_lsn"], r["v"]) for r in out.to_pylist()}
    assert got == {"a": (5, 50), "b": (2, 20)}


def test_last_per_key_tie_prefers_later_input_row():
    t = pa.table({"doc_id": ["a", "a"], "_lsn": [7, 7], "v": [1, 2]})
    out = last_per_key(t, order="_lsn")
    assert out.to_pylist() == [{"doc_id": "a", "_lsn": 7, "v": 2}]


def test_compact_events_is_lossless_combiner():
    rows = [
        ev(1, "insert", "a", [1, 2]),
        ev(2, "update", "a", [3]),
        ev(3, "delete", "a", None),
        ev(4, "upsert", "b", [9, 9, 9]),
    ]
    out = compact_events(events_table(rows))
    got = {r["doc_id"]: r["op"] for r in out.to_pylist()}
    assert got == {"a": "delete", "b": "upsert"}


def test_validate_events_counts_and_recomputes_ntok():
    rows = [
        ev(1, "insert", "a", [1, 2, 3]),
        ev(2, "bogus", "b", [1]),  # bad op
        ev(3, "update", "c", None),  # null tokens on upsert
        ev(4, "delete", "d", None),  # valid: deletes carry no payload
    ]
    t = events_table(rows)
    # corrupt n_tok on purpose: engine must recompute
    t = t.set_column(4, "n_tok", pa.array([99, 1, None, None], type=pa.int32()))
    out, n_bad = validate_events(t)
    assert n_bad == 2
    got = {r["doc_id"]: r["n_tok"] for r in out.to_pylist()}
    assert got == {"a": 3, "d": None}


def test_merge_partition_lww_and_tombstones():
    lake_events = events_table(
        [ev(1, "insert", "a", [1]), ev(2, "insert", "b", [2, 2])]
    )
    lake, _ = merge_partition(None, lake_events)
    delta = events_table(
        [
            ev(3, "update", "a", [7, 7]),  # overwrite a
            ev(4, "delete", "b", None),  # tombstone b
            ev(5, "insert", "c", [5]),  # new key
        ]
    )
    merged, stats = merge_partition(lake, delta)
    rows = {r["doc_id"]: r for r in merged.to_pylist()}
    assert rows["a"]["tokens"] == [7, 7] and rows["a"]["_deleted"] is False
    assert rows["b"]["_deleted"] is True and rows["b"]["tokens"] is None
    assert rows["c"]["tokens"] == [5]
    assert stats["rows_live"] == 2 and stats["rows_tombstoned"] == 1


def test_merge_out_of_order_replay_cannot_resurrect():
    """A replayed lower-LSN upsert for a deleted key must lose to the
    retained tombstone — the reason tombstones stay resident."""
    d1 = events_table([ev(10, "delete", "a", None)])
    lake, _ = merge_partition(None, d1)
    replayed = events_table([ev(5, "insert", "a", [1, 2, 3])])
    merged, _ = merge_partition(lake, replayed)
    rows = merged.to_pylist()
    assert len(rows) == 1 and rows[0]["_deleted"] is True


def test_schema_evolution_null_backfill():
    v0 = events_table([ev(1, "insert", "a", [1], with_source=False)], with_source=False)
    lake_v0, _ = merge_partition(None, v0, schema=pa.schema([f for f in LAKE_FILE_SCHEMA if f.name != "source"]))
    assert "source" not in lake_v0.column_names
    v1 = events_table([ev(2, "insert", "b", [2], source="srcX")])
    merged, _ = merge_partition(lake_v0, v1)
    rows = {r["doc_id"]: r for r in merged.to_pylist()}
    assert rows["a"]["source"] is None  # pre-evolution row null-backfilled
    assert rows["b"]["source"] == "srcX"


def test_conform_drops_extra_and_orders():
    t = pa.table({"b": [1], "a": ["x"], "z": [0.5]})
    s = pa.schema([("a", pa.string()), ("b", pa.int64()), ("c", pa.float64())])
    out = conform(t, s)
    assert out.schema == s
    assert out.to_pylist() == [{"a": "x", "b": 1, "c": None}]


def test_unify_concat_empty():
    assert unify_concat([], WAL_SCHEMA_V1).num_rows == 0


def test_merge_deterministic_bytes():
    """Same inputs -> identical serialized bytes (the property that
    makes retried partition merges exactly-once)."""
    import io

    import pyarrow.parquet as pq

    delta = events_table(
        [ev(i, "upsert", f"d{i % 3}", [i, i + 1]) for i in range(1, 20)]
    )
    bufs = []
    for _ in range(2):
        merged, _ = merge_partition(None, delta)
        b = io.BytesIO()
        pq.write_table(merged, b)
        bufs.append(b.getvalue())
    assert bufs[0] == bufs[1]


def test_prep_fns_tolerate_zero_row_batches():
    """A zero-row WAL segment (e.g. an empty resubmit epoch) must flow
    through BOTH prep stages — pc.sum over an empty mask is null, and
    `0 - None` used to TypeError the partial path."""
    from lakecdc.apply import make_prep_fn
    from lakecdc.schemas import WAL_SCHEMA_V1

    for engine in ("lww", "partial"):
        out = make_prep_fn(8, engine)(WAL_SCHEMA_V1.empty_table())
        assert out.num_rows == 0
        assert "bucket" in out.column_names
