"""Mergeable sketches — approximate aggregates for corpus-scale
streams: HyperLogLog (distinct count), KMV / k-minimum-values
(distinct count, deterministic), Misra-Gries (heavy hitters).

Shape: every sketch is a small MERGEABLE summary. map_batches emits
one summary per batch (bounded memory regardless of batch
cardinality); summaries reduce by a commutative, associative merge
(register-wise max / k-smallest union / counter sum + offset), so the
reduction tree can be arbitrary — the same semigroup property the
CDC combiner relies on. Hashing is vectorized SipHash (C-speed,
deterministic across processes), so HLL and KMV results are
batch-split invariant and reproducible.

The reference has no sketches (SURVEY §2.5 note); these are the
beyond-reference approximate family for 100 TB streams where exact
distinct/top-k would shuffle every key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from lakecdc.qutil import read

_HASH_KEY = "0123456789123456"


def _hash_u64(values: np.ndarray) -> np.ndarray:
    if values.dtype != object:
        values = values.astype(np.uint64)
        return pd.util.hash_array(values, hash_key=_HASH_KEY)
    return pd.util.hash_array(values, hash_key=_HASH_KEY)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_partial(values: np.ndarray, p: int = 12, hash_fn=None) -> np.ndarray:
    """One batch -> (2^p,) uint8 register array (max leading-zero rank
    per register). Vectorized: one hash, one shift, np.maximum.at."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = (hash_fn or _hash_u64)(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # exact vectorized floor(log2): 6 shift/compare rounds (float log2
    # misrounds near powers of two)
    v = rest.copy()
    lg = np.zeros(len(v), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        lg[m] += s
        v[m] >>= np.uint64(s)
    rank = np.clip(63 - lg + 1, 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(summaries: list[np.ndarray]) -> np.ndarray:
    out = summaries[0].copy()
    for s in summaries[1:]:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear counting (small range)
    return float(e)


# ---------------------------------------------------------------------------
# KMV (k minimum values)
# ---------------------------------------------------------------------------

def kmv_partial(values: np.ndarray, k: int = 1024) -> np.ndarray:
    """One batch -> its k smallest DISTINCT hash values (sorted)."""
    if len(values) == 0:
        return np.empty(0, dtype=np.uint64)
    h = np.unique(_hash_u64(values))
    return h[:k] if len(h) > k else h


def kmv_merge(summaries: list[np.ndarray], k: int = 1024) -> np.ndarray:
    u = np.unique(np.concatenate([s for s in summaries if len(s)] or [np.empty(0, np.uint64)]))
    return u[:k]


def kmv_estimate(mins: np.ndarray, k: int = 1024) -> float:
    if len(mins) < k:
        return float(len(mins))  # saw everything
    kth = float(mins[k - 1])
    return (k - 1) / (kth / 2.0**64)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def mg_partial(values: pd.Series, k: int = 64) -> pd.Series:
    """One batch -> Misra-Gries summary of <= k counters: exact batch
    counts decremented by the (k+1)-th largest (undercounts by at most
    n_batch/(k+1))."""
    counts = values.value_counts()
    if len(counts) <= k:
        return counts
    offset = counts.iloc[k]
    kept = counts.iloc[:k] - offset
    return kept[kept > 0]


def mg_merge(summaries: list[pd.Series], k: int = 64) -> pd.Series:
    total = pd.concat(summaries).groupby(level=0).sum()
    if len(total) <= k:
        return total.sort_values(ascending=False)
    total = total.sort_values(ascending=False)
    offset = total.iloc[k]
    kept = total.iloc[:k] - offset
    return kept[kept > 0]


# ---------------------------------------------------------------------------
# Queries (rows-only: approximate by design; accuracy pinned in pytest)
# ---------------------------------------------------------------------------

def _summaries(ds: rd.Dataset, col: str, fn) -> list:
    """map_batches -> one pickled summary per batch -> tiny driver-side
    merge (the summaries are KB-sized; at 100 TB the merge itself can
    tree-reduce, the semigroup property guarantees the same result)."""
    import pickle

    def part(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"summary": pa.array([pickle.dumps(fn(vals))], type=pa.binary())}
        )

    tbl = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return [pickle.loads(x) for x in tbl["summary"]]


def hll_distinct(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct counts via HLL(p=12) for three columns of
    three tables — one streamed pass each, 4 KB summary per batch."""
    out = []
    for table, col in [("events", "user_id"), ("orders", "o_custkey"), ("lineitem", "l_orderkey")]:
        ds = read(sf_dir, table, [col])
        regs = hll_merge(_summaries(ds, col, hll_partial))
        out.append({"table_col": f"{table}.{col}", "approx_distinct": int(round(hll_estimate(regs)))})
    return pd.DataFrame(out)


def kmv_distinct(sf_dir: str) -> pd.DataFrame:
    """Deterministic approximate distinct count via KMV (k=1024)."""
    out = []
    for table, col in [("events", "user_id"), ("lineitem", "l_partkey")]:
        ds = read(sf_dir, table, [col])
        mins = kmv_merge(_summaries(ds, col, kmv_partial))
        out.append({"table_col": f"{table}.{col}", "approx_distinct": int(round(kmv_estimate(mins)))})
    return pd.DataFrame(out)


def _splitmix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 of an int64 column (uint64 wraparound) — the one
    integer hash the DuckDB oracle reproduces exactly via HUGEINT
    mod-2^64 arithmetic (registry._mulmod), making the KMV sketch
    value-checkable end to end."""
    h = v.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def hll_verified(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """HyperLogLog whose ENTIRE register state the driver value-checks:
    same streamed register-max summaries as hll_distinct, but with the
    SQL-reproducible splitmix64 hash, reported as the register-rank
    HISTOGRAM (rank -> number of registers, rank 0 = untouched) — a
    stronger check than comparing the scalar estimate, with no float
    in sight. The oracle recomputes every register in DuckDB (leading
    zeros via six shift/compare stages)."""
    out = []
    for table, col in [("events", "user_id"), ("lineitem", "l_partkey")]:
        ds = read(sf_dir, table, [col])
        regs = hll_merge(
            _summaries(ds, col, lambda v: hll_partial(v, p, _splitmix64))
        )
        ranks, counts = np.unique(regs, return_counts=True)
        for r, n in zip(ranks, counts):
            out.append(
                {"table_col": f"{table}.{col}", "rank": int(r), "n_registers": int(n)}
            )
    df = pd.DataFrame(out)
    return df.astype({"rank": "int64", "n_registers": "int64"})


def kmv_verified(sf_dir: str, k: int = 1024) -> pd.DataFrame:
    """KMV distinct-count whose ESTIMATE the driver value-checks: same
    mergeable k-smallest-distinct-hash summaries as kmv_distinct, but
    with a SQL-reproducible hash (splitmix64) and an all-integer
    estimator — exact count when fewer than k distinct hashes were
    seen, else (k-1) * 2^64 // kth_min via arbitrary-precision ints
    (no float rounding to diverge from the HUGEINT SQL)."""
    out = []
    for table, col in [("events", "user_id"), ("lineitem", "l_partkey")]:
        ds = read(sf_dir, table, [col])
        mins = kmv_merge(
            _summaries(ds, col, lambda v: np.unique(_splitmix64(v))[:k]), k
        )
        if len(mins) < k:
            est = len(mins)
        else:
            est = (k - 1) * 2**64 // int(mins[k - 1])
        out.append({"table_col": f"{table}.{col}", "approx_distinct": est})
    df = pd.DataFrame(out)
    df["approx_distinct"] = df["approx_distinct"].astype("int64")
    return df


def heavy_hitters(sf_dir: str, k: int = 64, top: int = 10) -> pd.DataFrame:
    """Approximate top keys by frequency (Misra-Gries): any key with
    true frequency > n/(k+1) is guaranteed present; counts undercount
    by at most n/(k+1)."""
    ds = read(sf_dir, "lineitem", ["l_suppkey"])

    def part(vals: np.ndarray) -> pd.Series:
        return mg_partial(pd.Series(vals), k)

    merged = mg_merge(_summaries(ds, "l_suppkey", part), k)
    head = merged.iloc[:top]
    return pd.DataFrame(
        {"l_suppkey": head.index.astype("int64"), "approx_count": head.to_numpy().astype("int64")}
    )
