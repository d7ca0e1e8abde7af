"""Deterministic sampling operators — fixed-size, weighted, and
stratified samples whose membership is a pure function of the data
(closed-form universal hash, no RNG), so an identical SQL replay
value-checks every sampled row and a re-run / resumed pipeline draws
the IDENTICAL sample (a requirement for reproducible training-data
mixes).

Priority hash (same constants as lakecdc.dupindex's MinHash family):

    P = 2^31 - 1;  h(key) = (2654435761 % P * key + 97) % P

All arithmetic stays below 2^62, so numpy int64 and DuckDB BIGINT
agree bit-for-bit. Ties (hash collisions) break by key, making every
operator total-order deterministic.

Scale shapes:
- ``bottomk_sample``: per-block partial bottom-k inside map_batches
  (np.partition — O(rows) per block), so only n_blocks x k candidate
  rows ever reach the final sort+limit. The reference analogue is the
  nlargest/head reporting family (SURVEY §2.6 O4) with a
  deterministic-priority twist.
- ``weighted_sample``: weighted Bernoulli — include row iff
  h(key) < weight * c, a pure vectorized filter (no shuffle at all);
  the expected inclusion rate is proportional to the weight. Output
  is an aggregated digest so the checked value covers every included
  row without shipping the sample.
- ``stratified_sample``: per-group bottom-k — partial bottom-k per
  (block, group) before the ONE groupby shuffle, so the exchange
  carries at most n_blocks x groups x k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from lakecdc.qutil import read

MERSENNE_P = 2147483647
_HA = 2654435761 % MERSENNE_P
_HB = 97


def _h(key: np.ndarray) -> np.ndarray:
    return (_HA * key.astype(np.int64) + _HB) % MERSENNE_P


SQL_H = f"(({_HA} * {{key}}) + {_HB}) % {MERSENNE_P}"


def bottomk_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Global fixed-size uniform sample: the k orders with the
    smallest priority hash of ``o_orderkey`` (ties by key). Output
    (o_orderkey, priority) sorted by (priority, o_orderkey)."""

    def partial(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        h = _h(key)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            key, h = key[idx], h[idx]
        return pa.table(
            {
                "o_orderkey": pa.array(key.astype(np.int64)),
                "priority": pa.array(h),
            }
        )

    ds = read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # candidate set is n_blocks x k rows — the sort is output-scale
    out = (
        ds.sort(["priority", "o_orderkey"])
        .limit(k)
        .to_pandas()
        .astype({"o_orderkey": "int64", "priority": "int64"})
    )
    return out.reset_index(drop=True)


def weighted_sample(sf_dir: str, c: int = 5) -> pd.DataFrame:
    """Weighted Bernoulli sample over ``orders``: include an order iff
    ``h(o_orderkey) < w * c`` where ``w`` is the order's value in
    integer cents — inclusion probability proportional to order value
    (the 'sample big documents more' mix knob of a training-data
    pipeline), deterministic, no shuffle. Output: per o_orderpriority
    digest (n_sampled, key_sum, cents_sum) covering every included
    row."""
    from lakecdc.qutil import cents

    def part(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = cents(t["o_totalprice"]).to_numpy()
        keep = _h(key) < w * c
        pr = np.asarray(t["o_orderpriority"].to_pylist(), dtype=object)[keep]
        key, w = key[keep], w[keep]
        df = pd.DataFrame({"o_orderpriority": pr, "key": key, "cents": w})
        g = df.groupby("o_orderpriority", sort=False).agg(
            n_sampled=("key", "size"),
            key_sum=("key", "sum"),
            cents_sum=("cents", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index())

    ds = read(
        sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"]
    ).map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        ds.to_pandas()
        .groupby("o_orderpriority", sort=True)
        .sum()
        .reset_index()
        .astype({"n_sampled": "int64", "key_sum": "int64", "cents_sum": "int64"})
    )
    return out


def stratified_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Per-stratum fixed-size sample: for every ``l_returnflag``, the
    k lineitem rows with the smallest priority hash of the row key
    ``l_orderkey * 10 + l_linenumber`` (linenumber < 10 in TPC-H-ish
    data, so the packing is injective). Partial bottom-k per
    (block, stratum) bounds the groupby exchange. Output
    (l_returnflag, row_key, priority) sorted."""

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        rk = ok * 10 + ln
        h = _h(rk)
        flag = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        df = pd.DataFrame({"l_returnflag": flag, "row_key": rk, "priority": h})
        top = (
            df.sort_values(["priority", "row_key"], kind="stable")
            .groupby("l_returnflag", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(top, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["priority", "row_key"], kind="stable").head(k)

    ds = (
        read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .map_groups(final, batch_format="pandas")
    )
    out = (
        ds.to_pandas()
        .astype({"row_key": "int64", "priority": "int64"})
        .sort_values(["l_returnflag", "priority", "row_key"])
        .reset_index(drop=True)
    )
    return out[["l_returnflag", "row_key", "priority"]]
