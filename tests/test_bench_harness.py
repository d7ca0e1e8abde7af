"""Unit tests for bench.py's host-contention defenses (no Ray, no timing).

The harness pieces under test are pure control flow: wait_clear's
gate/timeout logic against a monkeypatched probe, and the probe record
shape every bench JSON embeds.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


CLEAR = {"ncpu": 32, "cache_eff": 0.40, "mem_eff": 0.25,
         "cache_solo_sec": 0.35, "mem_solo_sec": 0.55}
WAVE = {"ncpu": 32, "cache_eff": 0.21, "mem_eff": 0.01,
        "cache_solo_sec": 0.70, "mem_solo_sec": 0.60}


def test_wait_clear_returns_on_clear_window(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "contention_probe", lambda n: (calls.append(n), dict(CLEAR))[1])
    p = bench.wait_clear(mem_floor=0.12, cache_floor=0.30, timeout_s=10)
    assert calls == [bench.NCPU]
    assert "wait_clear_timeout" not in p
    assert p["mem_eff"] == CLEAR["mem_eff"]


def test_wait_clear_times_out_and_discloses(monkeypatch):
    monkeypatch.setattr(bench, "contention_probe", lambda n: dict(WAVE))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    p = bench.wait_clear(mem_floor=0.12, cache_floor=0.30, timeout_s=0)
    assert p["wait_clear_timeout"] is True


def test_wait_clear_requires_both_floors(monkeypatch):
    # cache recovers first in a bandwidth-only wave; gate must hold
    # until mem clears too.
    readings = [dict(CLEAR, mem_eff=0.01), dict(CLEAR)]
    monkeypatch.setattr(bench, "contention_probe", lambda n: readings.pop(0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    p = bench.wait_clear(mem_floor=0.12, cache_floor=0.30, timeout_s=600)
    assert not readings  # consumed both: first was rejected
    assert p["mem_eff"] == CLEAR["mem_eff"]


def test_contention_probe_record_shape():
    # The real ~4s probe at 2-way: every bench record embeds this dict,
    # so pin its schema (BENCH_r{N}.json consumers rely on it).
    p = bench.contention_probe(2)
    assert set(p) == {"ncpu", "cache_solo_sec", "cache_eff",
                      "mem_solo_sec", "mem_eff"}
    assert p["ncpu"] == 2
    assert 0 < p["cache_eff"] <= 1.5 and 0 < p["mem_eff"] <= 1.5
