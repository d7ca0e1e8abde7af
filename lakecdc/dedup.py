"""Deduplication family over the `documents` table: exact, token-set
Jaccard (exact, SQL-checkable), MinHash+LSH, SimHash, and
embedding-cosine near-dup.

Scale shapes:
- exact: content-hash in map_batches -> groupby(hash) -> first
  (lakecdc.queries.exact_dedup).
- jaccard (exact): token-set vectors over the (small) vocabulary,
  blocked matmul per batch against a broadcast matrix. At 100 TB the
  all-pairs form is replaced by the LSH candidate-gen below; the exact
  form remains the verifier.
- minhash-LSH: shingle->minhash per batch (vectorized), explode to
  (band, band_hash, doc) rows, groupby band bucket -> candidate pairs
  -> exact-Jaccard verify. Only candidates shuffle, never all pairs.
- simhash: 64-bit fingerprint per doc; near-dup = small Hamming
  distance within bucket prefixes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from lakecdc.qutil import read, read_small


def _token_sets(texts: pd.Series) -> list[set[str]]:
    return [set(t.strip().split()) for t in texts]


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


# ---------------------------------------------------------------------------
# Exact token-set Jaccard (the SQL-checkable ground truth)
# ---------------------------------------------------------------------------

def jaccard_dupes(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """All pairs (a < b) of documents with token-SET Jaccard >=
    threshold. Exact semantics: |A∩B| / |A∪B| over distinct
    whitespace tokens.

    Ray shape: the doc->token-set matrix over the vocabulary is built
    once and broadcast (ray.put); each batch of docs does one blocked
    boolean matmul against it — vectorized intersection counts, no
    Python pair loop. This is the brute-force verifier; the scale path
    is minhash_lsh_pairs (candidate-gen) feeding these exact checks.
    """
    docs = read_small(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    sets = _token_sets(docs["text"])
    vocab = sorted(set().union(*sets)) if sets else []
    vidx = {w: i for i, w in enumerate(vocab)}
    M = np.zeros((len(docs), len(vocab)), dtype=np.int32)
    for i, s in enumerate(sets):
        for w in s:
            M[i, vidx[w]] = 1
    sizes = M.sum(axis=1)
    ids = docs["doc_id"].to_numpy()
    m_ref = ray.put((M, sizes, ids))

    ds = rd.from_arrow(pa.table({"row": np.arange(len(docs), dtype=np.int64)}))

    def block(batch: pa.Table) -> pa.Table:
        M, sizes, ids = ray.get(m_ref)
        rows = batch["row"].to_numpy()
        inter = M[rows] @ M.T  # (b, N) intersection counts
        union = sizes[rows][:, None] + sizes[None, :] - inter
        jac = inter / np.maximum(union, 1)
        a_idx, b_idx = np.nonzero(jac >= threshold)
        a_ids_all = ids[rows[a_idx]]
        b_ids_all = ids[b_idx]
        keep = a_ids_all < b_ids_all  # each unordered pair once, by id
        a_ids = a_ids_all[keep]
        b_ids = b_ids_all[keep]
        jac_e6 = np.floor(jac[a_idx[keep], b_idx[keep]] * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a_ids, type=pa.int64()),
                "doc_b": pa.array(b_ids, type=pa.int64()),
                "jaccard_e6": pa.array(jac_e6),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow", batch_size=256)
    return out.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path; rows-only check)
# ---------------------------------------------------------------------------

class MinHasher:
    """Stateful actor-pool stage: the permutation parameters are drawn
    once per actor in __init__ (seeded — identical across actors);
    __call__ min-hashes a batch vectorized."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.p = np.uint64((1 << 61) - 1)
        self.a = rng.integers(1, self.p, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, self.p, size=num_perm, dtype=np.uint64)

    def signature(self, tokens: set[str]) -> np.ndarray:
        if not tokens:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        hv = np.array([_stable_u64(t) for t in sorted(tokens)], dtype=np.uint64)
        # (T, P) permuted hashes -> column mins
        perm = (hv[:, None] * self.a[None, :] + self.b[None, :]) % self.p
        return perm.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(s) for s in _token_sets(batch["text"])]
        batch = batch[["doc_id"]].copy()
        batch["sig"] = [s.tolist() for s in sigs]
        return batch


def minhash_lsh_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
) -> pd.DataFrame:
    """Near-dup candidate pairs via MinHash banding, verified with
    exact token-set Jaccard. Output (doc_a, doc_b, jaccard_e6) for
    verified pairs >= threshold.

    Shape: minhash per batch (actor pool) -> flat_map to (band,
    band_hash, doc_id) -> groupby band bucket -> pairs within bucket
    -> exact verify. The shuffle moves only (band_hash, doc_id) rows —
    numbers, not text; text for verification is fetched via a
    broadcast token-set map (documents are small-side here; at 100 TB
    the verify joins back to the docs by key range instead).
    """
    rows_per_band = num_perm // bands
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs={"num_perm": num_perm},
                          batch_format="pandas", batch_size=1024, concurrency=2)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_doc = [], [], []
        for doc, sig in zip(batch["doc_id"], batch["sig"]):
            s = np.asarray(sig, dtype=np.uint64).reshape(bands, rows_per_band)
            for b in range(bands):
                out_band.append(b)
                out_hash.append(int(hashlib.md5(s[b].tobytes()).hexdigest()[:16], 16))
                out_doc.append(doc)
        return pd.DataFrame({"band": out_band, "band_hash": out_hash, "doc_id": out_doc})

    buckets = sigs.map_batches(explode, batch_format="pandas")

    # Broadcast the doc->token-set binary matrix for exact, VECTORIZED
    # verification of candidates (one matmul per bucket, no Python pair
    # loop). At 100 TB the matrix is sharded by doc key range and the
    # verify joins candidates back to their shard.
    docs = read_small(sf_dir, "documents", ["doc_id", "text"]).to_pandas()
    sets = _token_sets(docs["text"])
    vocab = sorted(set().union(*sets)) if sets else []
    vidx = {w: i for i, w in enumerate(vocab)}
    M = np.zeros((len(docs), max(len(vocab), 1)), dtype=np.int32)
    for i, s in enumerate(sets):
        for w in s:
            M[i, vidx[w]] = 1
    row_of = dict(zip(docs["doc_id"].tolist(), range(len(docs))))
    verify_ref = ray.put((M, M.sum(axis=1), row_of))

    _empty = pd.DataFrame(
        {
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "jaccard_e6": pd.Series(dtype="int64"),
        }
    )

    # Shuffle buckets into a FIXED number of partitions (hash of the
    # bucket key), then do the per-partition candidate self-join and
    # exact verify fully vectorized — group count stays O(partitions),
    # not O(distinct band hashes), so tiny-group map_groups overhead
    # can't dominate at scale.
    n_parts = 32

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["part"] = pd.util.hash_array(
            batch["band_hash"].to_numpy(dtype=np.uint64)
        ) % n_parts
        return batch

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # Degenerate-bucket cap: a bucket holding more than max_bucket
        # docs means "most of the corpus hashes together" — it adds
        # O(bucket²) candidates with no discriminative value. Skipping
        # it is the standard LSH guard; recall for such corpora comes
        # from the exact verifier path (jaccard_dupes). NOT silent:
        # skipped mass is bounded and documented here, and the recall
        # floor is asserted in tests on non-degenerate data.
        sizes = g.groupby(["band", "band_hash"])["doc_id"].transform("size")
        g = g[sizes <= max_bucket]
        if g.empty:
            return _empty
        m = g.merge(g, on=["band", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]].drop_duplicates(
            ["doc_id_x", "doc_id_y"]
        )
        if m.empty:
            return _empty
        M, sizes, row_of = ray.get(verify_ref)
        ra = np.array([row_of[d] for d in m["doc_id_x"]])
        rb = np.array([row_of[d] for d in m["doc_id_y"]])
        inter = (M[ra] & M[rb]).sum(axis=1)
        union = sizes[ra] + sizes[rb] - inter
        jac = inter / np.maximum(union, 1)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_x"].to_numpy()[keep],
                "doc_b": m["doc_id_y"].to_numpy()[keep],
                "jaccard_e6": np.floor(jac[keep] * 1e6 + 0.5).astype(np.int64),
            }
        )

    cand = (
        buckets.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(pairs, batch_format="pandas")
    )
    df = cand.to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "jaccard_e6": pd.Series(dtype="int64")})
    df = df.drop_duplicates(["doc_a", "doc_b"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "jaccard_e6": "int64"}
    )
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash (rows-only)
# ---------------------------------------------------------------------------

def simhash_fingerprints(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per document over token hashes — deterministic,
    vectorized per batch. Output (doc_id, simhash) with simhash as a
    16-hex string (stable across engines)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in batch["text"]:
            toks = text.strip().split()
            if not toks:
                out.append("0" * 16)
                continue
            hv = np.array([_stable_u64(t) for t in toks], dtype=np.uint64)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            sh = np.uint64(0)
            for i in range(64):
                if votes[i] > 0:
                    sh |= np.uint64(1) << np.uint64(i)
            out.append(format(int(sh), "016x"))
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": out})

    return ds.map_batches(f, batch_format="pandas").to_pandas()


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (SQL-checkable via list_cosine_similarity)
# ---------------------------------------------------------------------------

def embedding_near_dup(sf_dir: str, threshold: float = 0.9) -> pd.DataFrame:
    """Pairs (a < b) of embeddings with cosine similarity >= threshold
    — exact brute force: each batch of vectors does one matmul against
    the broadcast normalized matrix (ray.put once, read per task)."""
    emb = read_small(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    ids = emb["vec_id"].to_numpy()
    V = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    norms = np.linalg.norm(V, axis=1)
    Vn = V / np.maximum(norms, 1e-30)[:, None]
    ref = ray.put((Vn, ids))

    ds = rd.from_arrow(pa.table({"row": np.arange(len(ids), dtype=np.int64)}))

    def block(batch: pa.Table) -> pa.Table:
        Vn, ids = ray.get(ref)
        rows = batch["row"].to_numpy()
        sims = Vn[rows] @ Vn.T
        a_idx, b_idx = np.nonzero(sims >= threshold)
        a_ids_all = ids[rows[a_idx]]
        b_ids_all = ids[b_idx]
        keep = a_ids_all < b_ids_all
        return pa.table(
            {
                "vec_a": pa.array(a_ids_all[keep], type=pa.int64()),
                "vec_b": pa.array(b_ids_all[keep], type=pa.int64()),
                "cos_e6": pa.array(
                    np.floor(sims[a_idx[keep], b_idx[keep]] * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow", batch_size=512)
    return out.to_pandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
