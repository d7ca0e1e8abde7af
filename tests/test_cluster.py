"""Distributed integer k-means (lakecdc.cluster): the Ray run must be
BIT-IDENTICAL to the single-process replay — integer quantization,
integer Lloyd steps and the first-minimum tie rule remove every source
of float-order nondeterminism, so no tolerance is needed."""

from __future__ import annotations

import pandas as pd

from lakecdc.cluster import kmeans_embeddings, kmeans_replay

SF = "/root/testdata/sf0.01"


def test_kmeans_exactly_matches_replay():
    got = kmeans_embeddings(SF)
    want = kmeans_replay(SF)
    pd.testing.assert_frame_equal(got, want)


def test_kmeans_partitions_everything_once():
    got = kmeans_embeddings(SF, k=5, iters=3)
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    assert int(got["n"].sum()) == n_rows
    assert got["cluster"].is_unique
    assert (got["inertia"] >= 0).all()


def test_kmeans_more_iters_not_worse():
    """Lloyd in exact arithmetic: total inertia after more iterations
    must not exceed the 1-iteration inertia (floor-division means can
    plateau but not regress meaningfully)."""
    one = int(kmeans_replay(SF, iters=1)["inertia"].sum())
    five = int(kmeans_replay(SF, iters=5)["inertia"].sum())
    assert five <= one
