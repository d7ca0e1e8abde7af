"""Single-process replay oracle — the pytest ground truth.

Deliberately the dumbest possible implementation: read every WAL
segment, sort ALL events by LSN, apply them one at a time to a Python
dict. The engine's lake after ingest must equal this per-row, with
token-array equality (BASELINE.json input_hint).

Reference analogue: the recompute-and-compare pattern of
scripts/validate_outputs.py:211-252 (re-derive TOTAL_SUPPORT and
require exact agreement) generalized to full-state replay.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from lakecdc.config import OP_DELETE, VALID_OPS
from lakecdc.evolve import conform
from lakecdc.schemas import WAL_SCHEMA_V1


def read_all_events(wal_dir: str, max_epoch: int | None = None) -> pa.Table:
    """All WAL segments (optionally only epochs <= max_epoch), conformed
    to the evolved schema, as one in-memory table."""
    tables = []
    for edir in sorted(glob.glob(os.path.join(wal_dir, "epoch=*"))):
        epoch = int(os.path.basename(edir).split("=")[1])
        if max_epoch is not None and epoch > max_epoch:
            continue
        for f in sorted(glob.glob(os.path.join(edir, "*.parquet"))):
            tables.append(conform(pq.read_table(f), WAL_SCHEMA_V1))
    if not tables:
        return WAL_SCHEMA_V1.empty_table()
    return pa.concat_tables(tables)


def replay(wal_dir: str, max_epoch: int | None = None) -> pd.DataFrame:
    """Final lake state per the oracle: columns (doc_id, tokens, n_tok,
    source), live rows only (tombstones applied), sorted by doc_id.
    tokens are Python lists of ints for exact comparison."""
    events = read_all_events(wal_dir, max_epoch)
    df = events.to_pandas().sort_values("lsn", kind="stable")
    state: dict[str, tuple] = {}
    for lsn, op, doc_id, tokens, _n_tok, source in zip(
        df["lsn"], df["op"], df["doc_id"], df["tokens"], df["n_tok"], df["source"]
    ):
        if op not in VALID_OPS or doc_id is None:
            continue  # mirrors validate_events: malformed events dropped
        if op == OP_DELETE:
            state[doc_id] = None  # tombstone
            continue
        if tokens is None:
            continue  # malformed upsert
        toks = [int(t) for t in tokens]
        state[doc_id] = (toks, len(toks), None if source is None else str(source))
    rows = [
        {"doc_id": k, "tokens": v[0], "n_tok": v[1], "source": v[2]}
        for k, v in state.items()
        if v is not None
    ]
    out = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])
    return out.sort_values("doc_id").reset_index(drop=True)


def replay_partial(wal_dir: str, max_epoch: int | None = None) -> pd.DataFrame:
    """Replay oracle for the PARTIAL merge engine (lakecdc.partial):
    patch sets only its non-null fields; full-row ops set every field;
    a key is alive iff its latest event is not a delete (a patch after
    a delete resurrects the row with just the patch's fields); fields
    written before the newest delete are gone. Alive rows may have
    null tokens/n_tok (patch-created rows)."""
    from lakecdc.config import OP_PATCH, VALID_OPS_PARTIAL

    events = read_all_events(wal_dir, max_epoch)
    df = events.to_pandas().sort_values("lsn", kind="stable")
    state: dict[str, dict | None] = {}
    for op, doc_id, tokens, source in zip(
        df["op"], df["doc_id"], df["tokens"], df["source"]
    ):
        if op not in VALID_OPS_PARTIAL or doc_id is None:
            continue
        if op == OP_DELETE:
            state[doc_id] = None  # tombstone: clears every field
            continue
        if op == OP_PATCH:
            cur = state.get(doc_id) or {"tokens": None, "source": None}
            if tokens is not None:
                cur = {**cur, "tokens": [int(t) for t in tokens]}
            if source is not None:
                cur = {**cur, "source": str(source)}
            state[doc_id] = cur
            continue
        if tokens is None:
            continue  # malformed full-row op
        state[doc_id] = {
            "tokens": [int(t) for t in tokens],
            "source": None if source is None else str(source),
        }
    rows = [
        {
            "doc_id": k,
            "tokens": v["tokens"],
            "n_tok": None if v["tokens"] is None else len(v["tokens"]),
            "source": v["source"],
        }
        for k, v in state.items()
        if v is not None
    ]
    out = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])
    return out.sort_values("doc_id").reset_index(drop=True)


def _norm_scalar(x):
    return None if x is None or (isinstance(x, float) and pd.isna(x)) else x


def assert_lake_equals_oracle(lake_df: pd.DataFrame, oracle_df: pd.DataFrame) -> None:
    """Per-row equality including exact token arrays. Tolerates null
    tokens/n_tok (the partial engine's patch-created rows)."""
    lake_df = lake_df.sort_values("doc_id").reset_index(drop=True)
    assert len(lake_df) == len(oracle_df), (
        f"row count {len(lake_df)} != oracle {len(oracle_df)}"
    )
    assert list(lake_df["doc_id"]) == list(oracle_df["doc_id"])
    got_ntok = [
        None if _norm_scalar(x) is None else int(x) for x in lake_df["n_tok"]
    ]
    want_ntok = [
        None if _norm_scalar(x) is None else int(x) for x in oracle_df["n_tok"]
    ]
    assert got_ntok == want_ntok
    assert [
        None if _norm_scalar(s) is None else str(s) for s in lake_df["source"]
    ] == list(oracle_df["source"])
    for i, (got, want) in enumerate(zip(lake_df["tokens"], oracle_df["tokens"])):
        got_l = None if _norm_scalar(got) is None else [int(t) for t in got]
        if got_l != want:
            raise AssertionError(
                f"token mismatch at row {i} doc_id={oracle_df['doc_id'][i]}"
            )
