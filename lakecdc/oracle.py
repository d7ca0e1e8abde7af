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


def assert_lake_equals_oracle(lake_df: pd.DataFrame, oracle_df: pd.DataFrame) -> None:
    """Per-row equality including exact token arrays."""
    lake_df = lake_df.sort_values("doc_id").reset_index(drop=True)
    assert len(lake_df) == len(oracle_df), (
        f"row count {len(lake_df)} != oracle {len(oracle_df)}"
    )
    assert list(lake_df["doc_id"]) == list(oracle_df["doc_id"])
    assert list(lake_df["n_tok"]) == list(oracle_df["n_tok"])
    assert [
        None if s is None or (isinstance(s, float) and pd.isna(s)) else str(s)
        for s in lake_df["source"]
    ] == list(oracle_df["source"])
    for i, (got, want) in enumerate(zip(lake_df["tokens"], oracle_df["tokens"])):
        got_l = [int(t) for t in got]
        if got_l != want:
            raise AssertionError(
                f"token mismatch at row {i} doc_id={oracle_df['doc_id'][i]}"
            )
