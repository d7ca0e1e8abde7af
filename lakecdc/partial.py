"""Partial-update merge engine (``merge_engine="partial"``): per-field
last-writer-wins with delete fencing — pure Arrow kernels, no Ray.

Semantics (the Debezium-partial-image / lake "partial-update merge
engine" pattern):

- ``op="patch"`` sets ONLY its non-null payload fields (``tokens``,
  ``source``); null fields inherit the current state.
- Full-row ops (insert/update/upsert) determine every field, including
  determining a field *to null*.
- A key is alive iff its max-LSN event is not a delete — a patch after
  a delete resurrects the row with just the patch's fields.
- A field is visible iff its writer's LSN is greater than the newest
  delete's LSN (deletes fence older field writes).
- ``n_tok`` stays derived from ``tokens``.

Representation: each key's state is a CELL row carrying the winning
value per field plus that field's writer LSN (``_tokens_lsn``,
``_source_lsn``), the newest delete LSN (``_del_lsn``) and the max
event LSN (``_lsn``). Every component of the fold is a per-key max /
argmax, so the fold is ASSOCIATIVE — batch-local pre-compaction (the
shuffle combiner), cross-epoch folding and merge-on-read chain folds
all reuse the same kernel, and visibility is applied only at read.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from lakecdc.config import OP_DELETE, OP_PATCH, VALID_OPS_PARTIAL
from lakecdc.evolve import conform

from lakecdc.schemas import LAKE_SCHEMA, PARTIAL_FILE_SCHEMA, WAL_SCHEMA_V1

_NEG1 = pa.scalar(-1, type=pa.int64())


def validation_mask_partial(batch: pa.Table) -> pa.BooleanArray:
    """Like apply._validation_mask, but ``patch`` is a valid op and may
    carry null payload fields (that's its point)."""
    ok = pc.is_in(batch["op"], value_set=pa.array(sorted(VALID_OPS_PARTIAL)))
    ok = pc.and_kleene(ok, pc.is_valid(batch["doc_id"]))
    ok = pc.and_kleene(ok, pc.is_valid(batch["lsn"]))
    needs_tokens = pc.invert(
        pc.or_(pc.equal(batch["op"], OP_DELETE), pc.equal(batch["op"], OP_PATCH))
    )
    ok = pc.and_kleene(
        ok, pc.or_kleene(pc.invert(needs_tokens), pc.is_valid(batch["tokens"]))
    )
    return pc.fill_null(ok, False)


def events_to_cells(events: pa.Table) -> pa.Table:
    """WAL events -> cell rows (see module docstring). A field's writer
    LSN is the event LSN when the event DETERMINES the field (full-row
    ops always; patch only for non-null fields), else -1."""
    events = conform(events, WAL_SCHEMA_V1)
    n = events.num_rows
    lsn = events["lsn"].combine_chunks() if n else events["lsn"]
    op = events["op"]
    is_del = pc.equal(op, OP_DELETE)
    is_patch = pc.equal(op, OP_PATCH)
    full = pc.invert(pc.or_(is_del, is_patch))
    tokens = events["tokens"]
    source = events["source"]
    tok_det = pc.or_(full, pc.and_(is_patch, pc.is_valid(tokens)))
    src_det = pc.or_(full, pc.and_(is_patch, pc.is_valid(source)))
    n_tok = pc.cast(pc.list_value_length(tokens), pa.int32())
    return pa.table(
        {
            "doc_id": events["doc_id"],
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
            "_lsn": lsn,
            "_del_lsn": pc.if_else(is_del, lsn, _NEG1),
            "_tokens_lsn": pc.if_else(tok_det, lsn, _NEG1),
            "_source_lsn": pc.if_else(src_det, lsn, _NEG1),
            "_deleted": is_del,  # recomputed by fold_cells; placeholder
        },
        schema=PARTIAL_FILE_SCHEMA,
    )


def fold_cells(cells: pa.Table) -> pa.Table:
    """Per-key semigroup fold, fused (round-4): ONE dictionary encode
    of ``doc_id`` + an O(n) scatter-argmax per order column (row LSN,
    delete LSN, tokens writer, source writer) — no sort of the n input
    rows (the old shape paid up to four indices-sorts per batch; this
    is the partial engine's version of the LWW ``compact_keep_mask``
    discipline). Ties on (key, order) resolve to the LAST input row,
    exactly like ``merge.last_per_key`` (stable sort, last wins) — so
    "delta beats lake at equal LSN" stays encoded by concat order.
    Output sorted by doc_id (only the k unique keys are sorted), one
    row per key, ``_deleted`` = the latest event is the delete."""
    import numpy as np

    if cells.num_rows == 0:
        return PARTIAL_FILE_SCHEMA.empty_table()
    dict_arr = pc.dictionary_encode(
        cells["doc_id"].combine_chunks()
        if isinstance(cells["doc_id"], pa.ChunkedArray)
        else cells["doc_id"]
    )
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    codes = dict_arr.indices.to_numpy().astype(np.int64, copy=False)
    keys = dict_arr.dictionary
    k = len(keys)

    def _col(col: str) -> "np.ndarray":
        c = cells[col]
        return (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c).to_numpy()

    def max_per_code(col: str) -> np.ndarray:
        """Per-code max value — the scalar columns need no row index."""
        v = _col(col)
        best = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(best, codes, v)
        return best

    def argmax_last(col: str) -> tuple[np.ndarray, np.ndarray]:
        """Per-code (max value, last row index achieving it) — for the
        payload columns whose winning row must be gathered."""
        v = _col(col)
        best = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(best, codes, v)
        m = v == best[codes]
        rows = np.full(k, -1, dtype=np.int64)
        np.maximum.at(rows, codes[m], np.nonzero(m)[0])
        return best, rows

    lsn_best = max_per_code("_lsn")
    del_best = max_per_code("_del_lsn")
    tok_best, tok_rows = argmax_last("_tokens_lsn")
    src_best, src_rows = argmax_last("_source_lsn")

    order = pc.sort_indices(keys).to_numpy().astype(np.int64, copy=False)
    tok_take = pa.array(tok_rows[order])
    return pa.table(
        {
            "doc_id": keys.take(pa.array(order)),
            "tokens": cells["tokens"].take(tok_take),
            "n_tok": cells["n_tok"].take(tok_take),
            "source": cells["source"].take(pa.array(src_rows[order])),
            "_lsn": pa.array(lsn_best[order]),
            "_del_lsn": pa.array(del_best[order]),
            "_tokens_lsn": pa.array(tok_best[order]),
            "_source_lsn": pa.array(src_best[order]),
            "_deleted": pa.array(lsn_best[order] == del_best[order]),
        },
        schema=PARTIAL_FILE_SCHEMA,
    )


def live_view(cells: pa.Table) -> pa.Table:
    """Apply visibility to folded cells -> user-facing live rows
    (LAKE_SCHEMA): drop dead keys, null out fields fenced by a newer
    delete."""
    alive = pc.greater(cells["_lsn"], cells["_del_lsn"])
    live = cells.filter(alive)
    n = live.num_rows
    tok_vis = pc.greater(live["_tokens_lsn"], live["_del_lsn"])
    src_vis = pc.greater(live["_source_lsn"], live["_del_lsn"])
    tokens = pc.if_else(
        tok_vis, live["tokens"].combine_chunks(), pa.nulls(n, pa.list_(pa.int32()))
    )
    n_tok = pc.if_else(tok_vis, live["n_tok"].combine_chunks(), pa.nulls(n, pa.int32()))
    source = pc.if_else(
        src_vis, live["source"].combine_chunks(), pa.nulls(n, pa.string())
    )
    return pa.table(
        {"doc_id": live["doc_id"], "tokens": tokens, "n_tok": n_tok, "source": source},
        schema=LAKE_SCHEMA,
    )


def normalize_cells(cells: pa.Table) -> pa.Table:
    """Compaction form: drop dead keys and apply delete fencing
    PERMANENTLY (fenced fields nulled, their writer LSNs cleared, the
    delete LSN reset). Safe once every applied event <= the partition
    watermark: later events carry higher LSNs, so removing the fence
    cannot change any future fold (same argument as LWW tombstone
    compaction)."""
    alive = pc.greater(cells["_lsn"], cells["_del_lsn"])
    live = cells.filter(alive)
    n = live.num_rows
    tok_vis = pc.greater(live["_tokens_lsn"], live["_del_lsn"])
    src_vis = pc.greater(live["_source_lsn"], live["_del_lsn"])
    neg1 = pa.array([-1] * n, type=pa.int64())
    return pa.table(
        {
            "doc_id": live["doc_id"],
            "tokens": pc.if_else(
                tok_vis,
                live["tokens"].combine_chunks(),
                pa.nulls(n, pa.list_(pa.int32())),
            ),
            "n_tok": pc.if_else(
                tok_vis, live["n_tok"].combine_chunks(), pa.nulls(n, pa.int32())
            ),
            "source": pc.if_else(
                src_vis, live["source"].combine_chunks(), pa.nulls(n, pa.string())
            ),
            "_lsn": live["_lsn"],
            "_del_lsn": neg1,
            "_tokens_lsn": pc.if_else(tok_vis, live["_tokens_lsn"].combine_chunks(), neg1),
            "_source_lsn": pc.if_else(src_vis, live["_source_lsn"].combine_chunks(), neg1),
            "_deleted": pa.array([False] * n, type=pa.bool_()),
        },
        schema=PARTIAL_FILE_SCHEMA,
    )


def merge_partition_partial(
    lake: pa.Table | None, delta_cells: pa.Table
) -> tuple[pa.Table, dict]:
    """Fold prior partition cells with this epoch's delta cells.
    Deterministic; same contract as merge.merge_partition."""
    from lakecdc.evolve import unify_concat

    combined = unify_concat(
        [lake if lake is not None else None, delta_cells], PARTIAL_FILE_SCHEMA
    )
    merged = fold_cells(combined)
    live = pc.sum(pc.cast(pc.invert(merged["_deleted"]), pa.int64())).as_py() or 0
    stats = {
        "rows_live": int(live),
        "rows_tombstoned": merged.num_rows - int(live),
        "rows_in_lake": 0 if lake is None else lake.num_rows,
        "rows_in_delta": delta_cells.num_rows,
    }
    return merged, stats
