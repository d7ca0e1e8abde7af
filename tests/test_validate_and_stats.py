"""Invariant validation (validate_outputs.py analogue) + statistical /
golden-range verification (verify_data.py analogue) over the flagship
synthetic pipeline.

Reference check families mirrored (scripts/verify_data.py):
- totals within an expected range (:58-67)
- category shares within ranges (:90-102)
- distribution-shape checks (right-skew, :255-265)
- known-key golden checks (:146-180)
"""

from __future__ import annotations

import numpy as np
import pytest

from lakecdc import oracle, synth
from lakecdc.apply import apply_all
from lakecdc.config import EngineConfig
from lakecdc.lake import read_lake_local
from lakecdc.validate import validate_lake


@pytest.fixture(scope="module")
def flagship_lake(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stats_lake"))
    cfg = EngineConfig(root=root, num_buckets=8)
    cfg.ensure_dirs()
    synth.write_wal(
        cfg.wal_dir,
        n_docs=400,
        n_epochs=3,
        events_per_epoch=1500,
        seed=42,
        evolution_epoch=2,
        zipf_a=1.3,
        p_invalid=0.01,
    )
    apply_all(cfg)
    return cfg, read_lake_local(cfg)


def test_validate_lake_all_checks_pass(flagship_lake):
    cfg, _ = flagship_lake
    results = validate_lake(cfg)
    assert all(ok for _, ok, _ in results), results
    names = {n for n, _, _ in results}
    assert {
        "pk_unique",
        "n_tok_invariant",
        "partition_purity",
        "lineage_live_total",
        "manifest_files_exist",
        "watermark_monotone",
    } <= names


def test_validate_detects_corruption(flagship_lake, tmp_path):
    """Corrupting a lake file must trip validation (the suite is not
    vacuously green)."""
    import shutil

    import pyarrow.parquet as pq

    cfg, _ = flagship_lake
    # copy the lake, then corrupt one partition's n_tok
    root2 = str(tmp_path / "corrupt")
    shutil.copytree(cfg.root, root2)
    cfg2 = EngineConfig(root=root2, num_buckets=cfg.num_buckets)
    # manifest records reference absolute paths into the ORIGINAL lake;
    # rewrite them to the copy
    import glob as g
    import json

    for p in g.glob(f"{cfg2.manifest_dir}/epoch=*/part-*.json"):
        rec = json.load(open(p))
        rec["files"] = [f.replace(cfg.root, root2) for f in rec["files"]]
        json.dump(rec, open(p, "w"))
    victim = json.load(
        open(sorted(g.glob(f"{cfg2.manifest_dir}/epoch=*/part-*.json"))[-1])
    )["files"][0]
    t = pq.read_table(victim)
    import pyarrow as pa

    bad = t.set_column(
        t.schema.get_field_index("n_tok"),
        "n_tok",
        pa.array([999] * t.num_rows, type=pa.int32()),
    )
    pq.write_table(bad, victim)
    with pytest.raises(AssertionError):
        validate_lake(cfg2)


def test_statistical_ranges(flagship_lake):
    """verify_data.py-style range checks on the synthetic corpus."""
    _, lake = flagship_lake
    # universe size: most of the 400 keys should be live (5% deletes)
    assert 250 <= len(lake) <= 400
    n_tok = lake["n_tok"].to_numpy()
    # token lengths are uniform in [1, 2*mean): check support + mean
    assert n_tok.min() >= 1 and n_tok.max() < 96
    assert 40 <= n_tok.mean() <= 56
    # evolution share: post-evolution sources present but not universal
    frac_src = lake["source"].notna().mean()
    assert 0.05 <= frac_src <= 0.95


def test_golden_hot_key(flagship_lake):
    """Known-key golden check (reference: Clinton P00003392 range,
    verify_data.py:146-161): the Zipf-hottest key doc00000000 must be
    present (overwhelmingly likely to receive a late upsert) and its
    payload must equal the oracle's exactly."""
    cfg, lake = flagship_lake
    ora = oracle.replay(cfg.wal_dir)
    hot = "doc00000000"
    in_lake = lake[lake["doc_id"] == hot]
    in_ora = ora[ora["doc_id"] == hot]
    assert len(in_lake) == len(in_ora)
    if len(in_ora):
        assert [int(x) for x in in_lake["tokens"].iloc[0]] == in_ora["tokens"].iloc[0]


def test_skew_profile(flagship_lake):
    """The synthetic WAL is genuinely skewed (the combiner path is
    exercised): the hottest key receives >5% of all events."""
    cfg, _ = flagship_lake
    ev = oracle.read_all_events(cfg.wal_dir)
    counts = ev["doc_id"].to_pandas().value_counts()
    assert counts.iloc[0] / len(ev) > 0.05
