"""Snapshot-diff changelog (lakecdc.diff): the emitted change stream
must round-trip — applying diff(A -> B) to snapshot A under LWW
reproduces snapshot B per-row — and be minimal (O(changed))."""

from __future__ import annotations

import pandas as pd
import pytest

from lakecdc import oracle
from lakecdc.apply import apply_all
from lakecdc.config import EngineConfig
from lakecdc.diff import collect_changelog, diff_snapshots
from lakecdc.lake import read_lake_local
from lakecdc.synth import write_wal


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("diff_lake"))
    cfg = EngineConfig(root=root, num_buckets=8)
    cfg.ensure_dirs()
    write_wal(
        cfg.wal_dir,
        n_docs=300,
        n_epochs=3,
        events_per_epoch=1200,
        seed=11,
        evolution_epoch=1,
        zipf_a=1.2,
    )
    apply_all(cfg)
    return cfg


def _apply_changelog(base: pd.DataFrame, ev: pd.DataFrame) -> pd.DataFrame:
    """Single-process replay of a changelog onto a snapshot frame."""
    state = {
        r.doc_id: (list(r.tokens), int(r.n_tok), r.source)
        for r in base.itertuples()
    }
    for r in ev.itertuples():
        if r.op == "delete":
            state.pop(r.doc_id, None)
        else:
            state[r.doc_id] = (list(r.tokens), int(r.n_tok), r.source)
    rows = [
        {"doc_id": k, "tokens": v[0], "n_tok": v[1], "source": v[2]}
        for k, v in sorted(state.items())
    ]
    return pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["tokens"] = df["tokens"].map(lambda t: tuple(t))
    return df.sort_values("doc_id").reset_index(drop=True)


def test_diff_round_trips_each_epoch(lake):
    for e in range(3):
        base = (
            read_lake_local(lake, up_to_epoch=e - 1)
            if e > 0
            else read_lake_local(lake, up_to_epoch=None).iloc[0:0]
        )
        if e == 0:
            ev = collect_changelog(diff_snapshots(lake, from_epoch=None, to_epoch=0))
        else:
            ev = collect_changelog(diff_snapshots(lake, from_epoch=e - 1, to_epoch=e))
        got = _apply_changelog(base, ev)
        want = read_lake_local(lake, up_to_epoch=e)
        pd.testing.assert_frame_equal(
            _canon(got), _canon(want), check_dtype=False
        )


def test_diff_none_to_latest_is_all_inserts(lake):
    ev = collect_changelog(diff_snapshots(lake, from_epoch=None))
    assert (ev["op"] == "insert").all()
    want = read_lake_local(lake)
    assert sorted(ev["doc_id"]) == sorted(want["doc_id"])


def test_diff_same_epoch_is_empty(lake):
    assert diff_snapshots(lake, from_epoch=1, to_epoch=1).count() == 0


def test_diff_is_minimal_and_typed(lake):
    """No unchanged rows are emitted; ops partition correctly."""
    base = read_lake_local(lake, up_to_epoch=0)
    final = read_lake_local(lake, up_to_epoch=2)
    ev = collect_changelog(diff_snapshots(lake, from_epoch=0, to_epoch=2))
    assert set(ev["op"]) <= {"insert", "update", "delete"}
    assert not ev["doc_id"].duplicated().any()
    base_ids = set(base["doc_id"])
    final_ids = set(final["doc_id"])
    ins = ev[ev["op"] == "insert"]
    upd = ev[ev["op"] == "update"]
    dele = ev[ev["op"] == "delete"]
    assert set(ins["doc_id"]).isdisjoint(base_ids)
    assert set(upd["doc_id"]) <= base_ids & final_ids
    assert set(dele["doc_id"]) <= base_ids - final_ids
    # emitted ops match the oracle's view of what changed
    assert ev["n_tok"].notna()[ev["op"] != "delete"].all()
    assert ev["lsn"].notna().all()  # tombstones resident: deletes keep LSN


def test_diff_matches_oracle_final_state(lake):
    """diff(None -> latest) applied to nothing == replay oracle."""
    ev = collect_changelog(diff_snapshots(lake, from_epoch=None))
    got = _apply_changelog(
        pd.DataFrame(columns=["doc_id", "tokens", "n_tok", "source"]), ev
    )
    want = oracle.replay(lake.wal_dir)[["doc_id", "tokens", "n_tok", "source"]]
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want.reset_index(drop=True)), check_dtype=False
    )


def test_diff_round_trips_on_partial_engine(tmp_root):
    """The diff also works over a partial-update lake: the emitted
    full-row changelog (visibility applied — delete-fenced fields are
    null) round-trips each epoch's live view."""
    from lakecdc.synth import write_wal as _ww

    cfg = EngineConfig(root=tmp_root, num_buckets=4, merge_engine="partial")
    cfg.ensure_dirs()
    _ww(cfg.wal_dir, n_docs=100, n_epochs=3, events_per_epoch=400,
        seed=13, p_patch=0.4, evolution_epoch=1)
    apply_all(cfg)

    def canon_np(df):
        df = df.copy()
        df["tokens"] = df["tokens"].map(
            lambda t: None if t is None else tuple(t)
        )
        df["n_tok"] = df["n_tok"].map(lambda v: None if pd.isna(v) else int(v))
        return df.sort_values("doc_id").reset_index(drop=True)

    state: dict = {}
    for e in range(3):
        ev = collect_changelog(diff_snapshots(cfg, from_epoch=e - 1 if e else None,
                                              to_epoch=e))
        for r in ev.itertuples():
            if r.op == "delete":
                state.pop(r.doc_id, None)
            else:
                state[r.doc_id] = (
                    None if r.tokens is None else list(r.tokens),
                    None if pd.isna(r.n_tok) else int(r.n_tok),
                    r.source,
                )
        got = pd.DataFrame(
            [
                {"doc_id": k, "tokens": v[0], "n_tok": v[1], "source": v[2]}
                for k, v in sorted(state.items())
            ],
            columns=["doc_id", "tokens", "n_tok", "source"],
        )
        want = read_lake_local(cfg, up_to_epoch=e)
        pd.testing.assert_frame_equal(
            canon_np(got), canon_np(want), check_dtype=False
        )


def test_suppress_unchanged_payload(tmp_path):
    """No-op churn suppression: a doc re-written with a new LSN but
    identical payload is dropped from the stream only when asked."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakecdc.schemas import WAL_SCHEMA_V0

    cfg = EngineConfig(root=str(tmp_path / "noop"), num_buckets=2)
    cfg.ensure_dirs()

    def seg(epoch, rows):
        d = os.path.join(cfg.wal_dir, f"epoch={epoch:09d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array(["upsert"] * len(rows)),
                    "doc_id": pa.array([r[1] for r in rows]),
                    "tokens": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
                    "n_tok": pa.array([len(r[2]) for r in rows], pa.int32()),
                },
                schema=WAL_SCHEMA_V0,
            ),
            os.path.join(d, "seg-0.parquet"),
        )

    seg(0, [(1, "a", [1, 2]), (2, "b", [3])])
    seg(1, [(3, "a", [1, 2]), (4, "b", [4])])  # a = no-op rewrite
    apply_all(cfg)

    plain = collect_changelog(diff_snapshots(cfg, from_epoch=0, to_epoch=1))
    assert sorted(plain["doc_id"]) == ["a", "b"]
    quiet = collect_changelog(
        diff_snapshots(cfg, from_epoch=0, to_epoch=1,
                       suppress_unchanged_payload=True)
    )
    assert sorted(quiet["doc_id"]) == ["b"]
    assert (quiet["op"] == "update").all()


def test_relay_writes_per_epoch_changelogs_and_resumes(lake, tmp_path):
    """The CDC relay materializes one changelog dir per committed
    epoch; a second invocation is a no-op (resume by output listing);
    the concatenated relayed stream replays to the final lake."""
    import glob
    import os

    import pyarrow.parquet as pq

    from lakecdc.diff import relay

    out = str(tmp_path / "feed")
    eps = relay(lake, out)
    assert eps == [0, 1, 2]
    assert relay(lake, out) == []  # resume: nothing new
    dirs = sorted(glob.glob(os.path.join(out, "epoch=*")))
    assert len(dirs) == 3
    state: dict = {}
    for d in dirs:
        ev = pq.read_table(d).to_pandas()
        for r in ev.itertuples():
            if r.op == "delete":
                state.pop(r.doc_id, None)
            else:
                state[r.doc_id] = (tuple(r.tokens), int(r.n_tok), r.source)
    want = read_lake_local(lake)
    assert len(state) == len(want)
    for doc, toks in zip(want["doc_id"], want["tokens"]):
        assert state[doc][0] == tuple(toks)


def test_relay_resumes_past_crash_leftover_tmp_dir(lake, tmp_path):
    """A crash mid-write leaves ``epoch=N.tmp.<pid>`` in the output
    dir; resume must neither crash on the non-numeric name nor count
    that epoch as done — it removes the stale temp dir and re-emits
    the identical epoch (round-2 ADVICE fix: the old `epoch=*` glob
    fed 'N.tmp.<pid>' to int())."""
    import glob as _glob
    import os

    from lakecdc.diff import relay

    out = str(tmp_path / "feed_crash")
    os.makedirs(os.path.join(out, "epoch=000000001.tmp.12345"))
    eps = relay(lake, out)
    assert eps == [0, 1, 2]
    assert not _glob.glob(os.path.join(out, "*.tmp.*"))
    assert relay(lake, out) == []  # clean resume afterwards
