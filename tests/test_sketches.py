"""Mergeable sketches: accuracy bounds, merge associativity /
batch-split invariance (HLL and KMV are deterministic given the fixed
hash), and the Misra-Gries frequency guarantee."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lakecdc.sketch import (
    hll_estimate,
    hll_merge,
    hll_partial,
    kmv_estimate,
    kmv_merge,
    kmv_partial,
    mg_merge,
    mg_partial,
)


def test_hll_accuracy_and_split_invariance():
    rng = np.random.default_rng(7)
    for true_n in (100, 5_000, 200_000):
        vals = rng.integers(0, 2**62, size=true_n * 2, dtype=np.int64) % (10**12)
        vals = np.unique(vals)[:true_n]
        whole = hll_partial(vals)
        split = hll_merge([hll_partial(c) for c in np.array_split(vals, 7)])
        assert (whole == split).all()  # register max-merge: split invariant
        est = hll_estimate(whole)
        assert abs(est - true_n) / true_n < 0.05  # p=12 -> ~1.6% std error


def test_hll_duplicates_dont_inflate():
    vals = np.repeat(np.arange(1000, dtype=np.int64), 50)
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 1000) / 1000 < 0.05


def test_kmv_accuracy_exact_small_and_split_invariant():
    rng = np.random.default_rng(3)
    small = np.arange(500, dtype=np.int64)  # < k: exact
    assert kmv_estimate(kmv_merge([kmv_partial(small)])) == 500
    big = rng.integers(0, 2**62, size=60_000, dtype=np.int64)
    true_n = len(np.unique(big))
    whole = kmv_merge([kmv_partial(big)])
    split = kmv_merge([kmv_partial(c) for c in np.array_split(big, 5)])
    assert (whole == split).all()
    est = kmv_estimate(whole)
    assert abs(est - true_n) / true_n < 0.1  # k=1024 -> ~3% std error


def test_misra_gries_guarantee():
    """Every key with true frequency > n/(k+1) appears in the merged
    summary, and approximate counts never exceed true counts by more
    than the decrement bound (they only undercount)."""
    rng = np.random.default_rng(11)
    k = 16
    # Zipf stream: a few dominant keys
    vals = pd.Series((rng.zipf(1.3, size=50_000) - 1) % 500)
    true = vals.value_counts()
    n = len(vals)
    chunks = np.array_split(vals.to_numpy(), 9)
    merged = mg_merge([mg_partial(pd.Series(c), k) for c in chunks], k)
    guaranteed = set(true[true > n / (k + 1)].index)
    assert guaranteed <= set(merged.index)
    for key, approx in merged.items():
        assert approx <= true[key]
        assert true[key] - approx <= n / (k + 1) * 2  # summed decrements


def test_sketch_queries_run():
    from lakecdc.sketch import heavy_hitters, hll_distinct, kmv_distinct

    sf = "/root/testdata/sf0.001"
    import duckdb

    con = duckdb.connect()
    hll = hll_distinct(sf)
    kmv = kmv_distinct(sf)
    hh = heavy_hitters(sf)
    assert len(hll) == 3 and len(kmv) == 2 and len(hh) == 10
    # accuracy against exact distincts
    for _, row in hll.iterrows():
        t, c = row["table_col"].split(".")
        exact = con.execute(
            f"SELECT COUNT(DISTINCT {c}) FROM read_parquet('{sf}/{t}.parquet')"
        ).fetchone()[0]
        assert abs(row["approx_distinct"] - exact) / max(exact, 1) < 0.05
    for _, row in kmv.iterrows():
        t, c = row["table_col"].split(".")
        exact = con.execute(
            f"SELECT COUNT(DISTINCT {c}) FROM read_parquet('{sf}/{t}.parquet')"
        ).fetchone()[0]
        assert abs(row["approx_distinct"] - exact) / max(exact, 1) < 0.1
    con.close()
