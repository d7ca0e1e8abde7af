"""Incremental inverted token index (lakecdc.index): per-epoch
maintenance must agree with a brute-force scan of the lake at every
epoch (including retractions from updates and deletes), and lookups
must only read the one token-bucket chain."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from lakecdc.apply import apply_all
from lakecdc.config import EngineConfig
from lakecdc.index import (
    build_index,
    complete_epochs,
    index_dir,
    lookup_token,
    update_index,
)
from lakecdc.lake import read_lake_local
from lakecdc.synth import write_wal

TB = 8


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_lake"))
    cfg = EngineConfig(root=root, num_buckets=8)
    cfg.ensure_dirs()
    write_wal(
        cfg.wal_dir,
        n_docs=250,
        n_epochs=3,
        events_per_epoch=1000,
        seed=23,
        evolution_epoch=1,
        zipf_a=1.2,
    )
    apply_all(cfg)
    n = build_index(cfg, token_buckets=TB)
    assert n > 0
    return cfg


def _brute(cfg, token, up_to_epoch=None):
    lake = read_lake_local(cfg, up_to_epoch=up_to_epoch)
    return sorted(
        d for d, t in zip(lake["doc_id"], lake["tokens"]) if token in set(t)
    )


def _sample_tokens(cfg, k=12):
    lake = read_lake_local(cfg)
    flat = np.concatenate([np.asarray(t) for t in lake["tokens"] if len(t)])
    uniq = np.unique(flat)
    step = max(1, len(uniq) // k)
    return [int(x) for x in uniq[::step][:k]] + [int(uniq.max()) + 7]  # + a missing one


def test_lookup_matches_brute_scan_latest(lake):
    for tok in _sample_tokens(lake):
        assert lookup_token(lake, tok, token_buckets=TB) == _brute(lake, tok)


def test_lookup_time_travel_matches_each_epoch(lake):
    toks = _sample_tokens(lake, k=6)
    for e in complete_epochs(lake):
        for tok in toks:
            assert lookup_token(
                lake, tok, token_buckets=TB, up_to_epoch=e
            ) == _brute(lake, tok, up_to_epoch=e), (tok, e)


def test_update_index_idempotent(lake):
    """Re-running maintenance for an epoch rewrites identical content."""
    before = {
        f: open(f, "rb").read()
        for f in glob.glob(os.path.join(index_dir(lake), "**", "*.parquet"),
                           recursive=True)
    }
    update_index(lake, 1, token_buckets=TB)
    for f, blob in before.items():
        if "epoch=000000001" in f:
            assert open(f, "rb").read() == blob


def test_index_layout_is_bucketed(lake):
    """A lookup's file set is confined to one tb directory."""
    dirs = glob.glob(os.path.join(index_dir(lake), "epoch=*", "tb=*"))
    assert len({os.path.basename(d) for d in dirs}) <= TB
    assert len(dirs) > 0


def test_full_index_after_compaction_and_vacuum(tmp_path):
    """A lake whose pre-compaction history was vacuumed still indexes:
    the first resident snapshot is indexed full, and lookups match."""
    from lakecdc.compact import compact, vacuum

    cfg = EngineConfig(root=str(tmp_path / "cl"), num_buckets=4)
    cfg.ensure_dirs()
    write_wal(cfg.wal_dir, n_docs=120, n_epochs=2, events_per_epoch=500, seed=5)
    apply_all(cfg)
    compact(cfg)
    vacuum(cfg)
    n = build_index(cfg, token_buckets=4)
    assert n > 0
    for tok in _sample_tokens(cfg, k=5):
        assert lookup_token(cfg, tok, token_buckets=4) == _brute(cfg, tok)


def test_validate_lake_includes_index_checks(lake):
    """validate_lake gains index_fresh + sampled-lookup checks when an
    index exists, and flags a stale index (maintenance behind the
    manifest)."""
    import shutil

    from lakecdc.validate import validate_lake

    results = {name: ok for name, ok, _ in validate_lake(lake)}
    assert results.get("index_fresh") is True
    assert results.get("index_sampled_lookup") is True
    # simulate skipped maintenance: drop the newest index epoch
    newest = sorted(glob.glob(os.path.join(index_dir(lake), "epoch=*")))[-1]
    backup = os.path.join(lake.root, "idx_backup")
    shutil.move(newest, backup)
    try:
        bad = {name: ok for name, ok, _ in validate_lake(lake, raise_on_fail=False)}
        assert bad.get("index_fresh") is False
    finally:
        shutil.move(backup, newest)
