"""Property-based tests (hypothesis) for the dedup/text kernels:
results must be invariant to batch composition (how docs are grouped
into map_batches calls) and, for MinHash, to within-doc token
duplication and order — the guarantees the distributed pipelines rely
on when Ray re-blocks data. Kernel-level (no Ray session)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lakecdc.dedup import MinHasher

token_st = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "y2"])
doc_st = st.lists(token_st, max_size=12)


def _batch(texts: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": list(range(len(texts))), "text": texts}
    )


@settings(max_examples=60, deadline=None)
@given(docs=st.lists(doc_st, min_size=1, max_size=8), cut=st.integers(0, 8))
def test_minhash_signatures_batch_split_invariant(docs, cut):
    """sig_and_tokens over one batch == over any two-way split."""
    mh = MinHasher(16)
    texts = [" ".join(d) for d in docs]
    whole = mh.sig_and_tokens(_batch(texts))
    cut = min(cut, len(texts))
    parts = [
        mh.sig_and_tokens(_batch(texts[:cut])),
        mh.sig_and_tokens(_batch(texts[cut:])),
    ]
    split = pd.concat([p for p in parts if len(p)], ignore_index=True)
    for i in range(len(texts)):
        assert (np.asarray(whole["sig"][i]) == np.asarray(split["sig"][i])).all()
        assert (np.asarray(whole["toks"][i]) == np.asarray(split["toks"][i])).all()


@settings(max_examples=60, deadline=None)
@given(doc=st.lists(token_st, min_size=1, max_size=12), seed=st.integers(0, 5))
def test_minhash_signature_set_semantics(doc, seed):
    """Signature depends only on the token SET: duplication and order
    don't change it (the LSH contract)."""
    rng = np.random.default_rng(seed)
    mh = MinHasher(16)
    base = mh.signatures(pd.Series([" ".join(doc)]))
    dup = doc + [doc[int(rng.integers(len(doc)))]]
    rng.shuffle(dup)
    other = mh.signatures(pd.Series([" ".join(dup)]))
    assert (base == other).all()


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(doc_st, min_size=1, max_size=6))
def test_minhash_estimate_bounds(docs):
    """Identical docs estimate 1.0; signature agreement is always in
    [0, 1] and equals 1 for equal token sets."""
    mh = MinHasher(16)
    texts = [" ".join(d) for d in docs]
    sig = mh.signatures(pd.Series(texts + texts))
    n = len(texts)
    agree = (sig[:n] == sig[n:]).mean(axis=1)
    assert (agree == 1.0).all()
