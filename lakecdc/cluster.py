"""Distributed k-means over the embedding table — the clustering
stage of a training-data pipeline (corpus bucketing, semantic mix
balancing, IVF cell training at full-corpus scale rather than
ann.py's sample-trained centroids).

EXACT INTEGER Lloyd iterations: embeddings are quantized once to
int64 (floor(x * 1e6)), distances and centroid updates stay in int64
(floor-division means), and argmin ties break to the lowest cluster
id — so the distributed run is bit-identical to a single-process
replay (tests/test_cluster.py) with NO float-order sensitivity. This
is the same exactness discipline as the engine's *_cents/*_e6 query
convention (lakecdc/qutil.py).

Scale shape per iteration: ONE map_batches pass emitting k partial
rows (sum vector + count) per block — the all-reduce is k x blocks
tiny rows folded on the driver; the (quantized) corpus itself is
materialized once into the object store and never shuffles. Ray
iterative-ML idiom: broadcast centroids via ray.put each round,
object-store-cache the training set, keep the per-round reduce
output-scale.

Magnitude check: |x| <= ~2 after normalization-scale inputs, so
quantized entries are ~2e6; squared terms ~4e12, summed over dim<=256
stays < 2^62 — every intermediate fits int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from lakecdc.qutil import read, table_path

SCALE = 1_000_000


def _quantize(emb_col) -> np.ndarray:
    """list<float> column -> (n, d) int64 matrix, floor(x * 1e6)."""
    arr = emb_col
    if hasattr(arr, "combine_chunks"):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(arr[0])
    X = np.floor(flat * SCALE).astype(np.int64).reshape(-1, d)
    return X


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest centroid per row in exact int64 arithmetic; ties break
    to the lowest cluster id (np.argmin keeps the first minimum)."""
    x2 = np.einsum("ij,ij->i", X, X)
    c2 = np.einsum("ij,ij->i", C, C)
    d2 = x2[:, None] - 2 * (X @ C.T) + c2[None, :]
    return np.argmin(d2, axis=1)


def kmeans_embeddings(
    sf_dir: str, k: int = 8, iters: int = 5
) -> pd.DataFrame:
    """k-means over `embeddings` with deterministic init (the k
    smallest vec_ids' vectors). Returns one row per cluster:
    (cluster, n, inertia, centroid_l1) — exact int64 digests of the
    final assignment, equal to the single-process replay."""
    import pyarrow.parquet as pq
    import ray

    init_t = pq.read_table(
        table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    order = np.argsort(init_t["vec_id"].to_numpy(zero_copy_only=False),
                       kind="stable")[:k]
    C = _quantize(init_t["embedding"])[order]
    del init_t

    def quant(t: pa.Table) -> pa.Table:
        X = _quantize(t["embedding"])
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "q": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.ravel()), X.shape[1]
                ),
            }
        )

    ds = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()  # iterative reuse: cache the quantized corpus once
    )
    d = C.shape[1]

    def block_mat(t: pa.Table) -> np.ndarray:
        q = t["q"]
        if hasattr(q, "combine_chunks"):
            q = q.combine_chunks()
        return q.values.to_numpy(zero_copy_only=False).reshape(-1, d)

    for _ in range(iters):
        cref = ray.put(C)

        def partials(t: pa.Table) -> pa.Table:
            import ray as _ray

            Cb = _ray.get(cref)
            X = block_mat(t)
            a = _assign(X, Cb)
            rows_c, rows_n, rows_s = [], [], []
            for c in np.unique(a):
                sel = X[a == c]
                rows_c.append(int(c))
                rows_n.append(len(sel))
                rows_s.append(sel.sum(axis=0))
            return pa.table(
                {
                    "cluster": pa.array(rows_c, type=pa.int64()),
                    "n": pa.array(rows_n, type=pa.int64()),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(np.concatenate(rows_s)), d
                    ),
                }
            )

        pt = ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # k x blocks tiny rows
        newC = C.copy()
        for c, g in pt.groupby("cluster"):
            tot = np.sum(np.stack(g["s"].to_numpy()), axis=0).astype(np.int64)
            n = int(g["n"].sum())
            newC[int(c)] = tot // n  # floor division: exact, replayable
        C = newC

    cref = ray.put(C)

    def digest(t: pa.Table) -> pa.Table:
        import ray as _ray

        Cb = _ray.get(cref)
        X = block_mat(t)
        a = _assign(X, Cb)
        diff = X - Cb[a]
        inert = np.einsum("ij,ij->i", diff, diff)
        df = pd.DataFrame({"cluster": a, "inertia": inert})
        g = df.groupby("cluster").agg(n=("inertia", "size"),
                                      inertia=("inertia", "sum"))
        return pa.Table.from_pandas(g.reset_index())

    agg = (
        ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("cluster", sort=True)
        .sum()
        .reset_index()
    )
    agg["centroid_l1"] = [int(np.abs(C[int(c)]).sum()) for c in agg["cluster"]]
    return agg.astype(
        {"cluster": "int64", "n": "int64", "inertia": "int64",
         "centroid_l1": "int64"}
    )


def kmeans_replay(sf_dir: str, k: int = 8, iters: int = 5) -> pd.DataFrame:
    """Single-process replay of kmeans_embeddings (pytest ground
    truth): same quantization, same integer Lloyd steps, same tie
    rule — must match the distributed run EXACTLY."""
    import pyarrow.parquet as pq

    t = pq.read_table(table_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    X = _quantize(t["embedding"])
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False),
                       kind="stable")[:k]
    C = X[order].copy()
    for _ in range(iters):
        a = _assign(X, C)
        newC = C.copy()
        for c in np.unique(a):
            sel = X[a == c]
            newC[int(c)] = sel.sum(axis=0, dtype=np.int64) // len(sel)
        C = newC
    a = _assign(X, C)
    diff = X - C[a]
    inert = np.einsum("ij,ij->i", diff, diff)
    df = pd.DataFrame({"cluster": a, "inertia": inert})
    out = df.groupby("cluster", sort=True).agg(
        n=("inertia", "size"), inertia=("inertia", "sum")
    ).reset_index()
    out["centroid_l1"] = [int(np.abs(C[int(c)]).sum()) for c in out["cluster"]]
    return out.astype(
        {"cluster": "int64", "n": "int64", "inertia": "int64",
         "centroid_l1": "int64"}
    )
