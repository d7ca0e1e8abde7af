"""Similarity search over the `embeddings` table: brute-force cosine
top-k (the exact baseline, SQL-checkable) and an IVF-bucketed
approximate variant (the 100 TB scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from lakecdc.qutil import read, read_small


def _matrix(sf_dir: str):
    emb = read_small(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    ids = emb["vec_id"].to_numpy()
    V = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1), 1e-30)[:, None]
    return ids, Vn


def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 5) -> pd.DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries, corpus = all
    vectors (self excluded). Tie-break: higher sim first, then lower
    vec_id — matching the oracle's ORDER BY.

    Ray shape: the normalized corpus matrix is broadcast once
    (ray.put); the query stream is a Dataset; each batch does one
    matmul + argpartition. At scale the corpus side is sharded and
    per-shard top-k results are merged (k small -> merge is tiny).
    """
    ids, Vn = _matrix(sf_dir)
    ref = ray.put((ids, Vn))
    qrows = np.nonzero(ids < n_queries)[0]
    ds = rd.from_arrow(pa.table({"qrow": qrows.astype(np.int64)}))

    def block(batch: pa.Table) -> pa.Table:
        ids, Vn = ray.get(ref)
        out_q, out_n, out_s = [], [], []
        rows = batch["qrow"].to_numpy()
        sims = Vn[rows] @ Vn.T  # (b, N)
        for bi, r in enumerate(rows):
            s = sims[bi].copy()
            s[r] = -np.inf  # exclude self
            # sort by (-sim, vec_id): lexsort with primary last
            order = np.lexsort((ids, -s))[:k]
            out_q.extend([ids[r]] * len(order))
            out_n.extend(ids[order].tolist())
            out_s.extend(np.floor(s[order] * 1e6 + 0.5).astype(np.int64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos_e6": pa.array(out_s, type=pa.int64()),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow", batch_size=64)
    return (
        out.to_pandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )


class IVFIndex:
    """IVF (inverted-file) ANN: k-means-lite centroids (seeded, few
    Lloyd iterations), vectors assigned to nearest centroid; a query
    probes only the closest `nprobe` cells. Stateful actor-pool stage:
    the index is built ONCE per actor in __init__ from the broadcast
    matrix; queries stream through __call__.

    Approximate by construction -> rows-only check (no SQL oracle);
    recall vs ann_topk is asserted in tests.
    """

    def __init__(self, ref, n_cells: int = 16, nprobe: int = 4, k: int = 5, seed: int = 42):
        ids, Vn = ray.get(ref)
        self.ids, self.Vn, self.nprobe, self.k = ids, Vn, nprobe, k
        rng = np.random.default_rng(seed)
        cent = Vn[rng.choice(len(Vn), size=min(n_cells, len(Vn)), replace=False)]
        for _ in range(5):  # Lloyd iterations
            assign = (Vn @ cent.T).argmax(axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    v = Vn[m].mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-30)
        self.centroids = cent
        self.assign = (Vn @ cent.T).argmax(axis=1)
        self.cells = [np.nonzero(self.assign == c)[0] for c in range(len(cent))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_n, out_s = [], [], []
        for r in batch["qrow"].to_numpy():
            probes = (self.centroids @ self.Vn[r]).argsort()[::-1][: self.nprobe]
            cand = np.concatenate([self.cells[c] for c in probes])
            cand = cand[cand != r]
            sims = self.Vn[cand] @ self.Vn[r]
            order = np.lexsort((self.ids[cand], -sims))[: self.k]
            out_q.extend([self.ids[r]] * len(order))
            out_n.extend(self.ids[cand[order]].tolist())
            out_s.extend(np.floor(sims[order] * 1e6 + 0.5).astype(np.int64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos_e6": pa.array(out_s, type=pa.int64()),
            }
        )


class LSHIndex:
    """Random-hyperplane LSH ANN: vectors bucketed by the sign pattern
    of `n_planes` seeded random projections; a query probes its own
    bucket plus the `nprobe` nearest buckets by Hamming distance of
    the code. Stateful actor-pool stage like IVFIndex; approximate ->
    rows-only check, recall asserted in tests."""

    def __init__(self, ref, n_planes: int = 6, nprobe: int = 24, k: int = 5, seed: int = 42):
        ids, Vn = ray.get(ref)
        self.ids, self.Vn, self.k, self.nprobe = ids, Vn, k, nprobe
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, Vn.shape[1]))
        codes = (Vn @ self.planes.T > 0) @ (1 << np.arange(n_planes))
        self.codes = codes.astype(np.int64)
        self.buckets: dict[int, np.ndarray] = {
            c: np.nonzero(self.codes == c)[0] for c in np.unique(self.codes)
        }
        self.all_codes = np.array(sorted(self.buckets))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_n, out_s = [], [], []
        for r in batch["qrow"].to_numpy():
            qc = self.codes[r]
            ham = np.array([bin(int(qc) ^ int(c)).count("1") for c in self.all_codes])
            probe = self.all_codes[np.argsort(ham, kind="stable")[: self.nprobe]]
            cand = np.concatenate([self.buckets[c] for c in probe])
            cand = cand[cand != r]
            if len(cand) == 0:
                continue
            sims = self.Vn[cand] @ self.Vn[r]
            order = np.lexsort((self.ids[cand], -sims))[: self.k]
            out_q.extend([self.ids[r]] * len(order))
            out_n.extend(self.ids[cand[order]].tolist())
            out_s.extend(np.floor(sims[order] * 1e6 + 0.5).astype(np.int64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cos_e6": pa.array(out_s, type=pa.int64()),
            }
        )


def ann_lsh(sf_dir: str, n_queries: int = 8, k: int = 5) -> pd.DataFrame:
    ids, Vn = _matrix(sf_dir)
    ref = ray.put((ids, Vn))
    qrows = np.nonzero(ids < n_queries)[0]
    ds = rd.from_arrow(pa.table({"qrow": qrows.astype(np.int64)}))
    out = ds.map_batches(
        LSHIndex,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"k": k},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )
    return (
        out.to_pandas().sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    )


def ann_ivf(sf_dir: str, n_queries: int = 8, k: int = 5) -> pd.DataFrame:
    ids, Vn = _matrix(sf_dir)
    ref = ray.put((ids, Vn))
    qrows = np.nonzero(ids < n_queries)[0]
    ds = rd.from_arrow(pa.table({"qrow": qrows.astype(np.int64)}))
    out = ds.map_batches(
        IVFIndex,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"k": k},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )
    return (
        out.to_pandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
