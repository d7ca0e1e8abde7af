"""Property-based tests (hypothesis): random event streams through the
engine's kernels must equal a dict replay, for ANY batch split.

Covers edge cases the seeded generator never hits: empty token lists,
deletes of never-inserted keys, upsert-after-delete chains, single-key
streams, adversarial batch boundaries. Kernel-level (no Ray) so
hundreds of examples run in seconds; the full Ray path is pinned by
the e2e suite (same kernels, same semantics).

LSNs are unique by engine contract (a WAL position); generators
enforce it.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lakecdc.apply import make_prep_fn
from lakecdc.config import OP_DELETE
from lakecdc.merge import compact_events, merge_partition
from lakecdc.schemas import WAL_SCHEMA_V1

DOCS = [f"d{i}" for i in range(6)]

event_st = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["insert", "update", "upsert", "delete"]),
        "doc_id": st.sampled_from(DOCS),
        "tokens": st.lists(st.integers(0, 100), max_size=5),
        "source": st.one_of(st.none(), st.sampled_from(["a", "b"])),
    }
)


def to_table(events: list[dict]) -> pa.Table:
    rows = []
    for lsn, e in enumerate(events, start=1):  # unique LSNs by contract
        tokens = None if e["op"] == OP_DELETE else e["tokens"]
        rows.append(
            {
                "lsn": lsn,
                "op": e["op"],
                "doc_id": e["doc_id"],
                "tokens": tokens,
                "n_tok": None if tokens is None else len(tokens),
                "source": e["source"],
            }
        )
    return pa.Table.from_pylist(rows, schema=WAL_SCHEMA_V1)


def dict_replay(events: list[dict]) -> dict[str, tuple]:
    state: dict[str, tuple | None] = {}
    for lsn, e in enumerate(events, start=1):
        if e["op"] == OP_DELETE:
            state[e["doc_id"]] = None
        else:
            state[e["doc_id"]] = (tuple(e["tokens"]), e["source"])
    return {k: v for k, v in state.items() if v is not None}


def engine_replay(events: list[dict], splits: list[int], num_buckets: int) -> dict:
    """Run the real pipeline kernels: per-batch prep (validate +
    compact + bucket), per-bucket global compact + merge."""
    table = to_table(events)
    prep = make_prep_fn(num_buckets)
    # arbitrary batch boundaries
    batches = []
    start = 0
    for s in splits:
        if start >= table.num_rows:
            break
        batches.append(table.slice(start, s))
        start += s
    if start < table.num_rows:
        batches.append(table.slice(start))
    prepped = [prep(b) for b in batches if b.num_rows]
    state: dict[str, tuple] = {}
    if not prepped:
        return state
    allp = pa.concat_tables(prepped, promote_options="default")
    import pyarrow.compute as pc

    for b in range(num_buckets):
        grp = allp.filter(pc.equal(allp["bucket"], b))
        if grp.num_rows == 0:
            continue
        events_b = grp.drop_columns(["bucket", "_invalid"])
        delta = compact_events(events_b)
        merged, _ = merge_partition(None, delta)
        live = merged.filter(pc.invert(merged["_deleted"]))
        for r in live.to_pylist():
            state[r["doc_id"]] = (tuple(r["tokens"]), r["source"])
            assert r["n_tok"] == len(r["tokens"])  # invariant holds
    return state


@settings(max_examples=150, deadline=None)
@given(
    events=st.lists(event_st, max_size=40),
    splits=st.lists(st.integers(1, 7), max_size=10),
    num_buckets=st.sampled_from([1, 3, 8]),
)
def test_kernel_replay_matches_dict_replay(events, splits, num_buckets):
    assert engine_replay(events, splits, num_buckets) == dict_replay(events)


@settings(max_examples=60, deadline=None)
@given(events=st.lists(event_st, max_size=30))
def test_fold_order_independence(events):
    """Applying the stream as one fold equals applying it as two halves
    merged sequentially (the apply_epochs correctness argument)."""
    if not events:
        return
    half = len(events) // 2
    t = to_table(events)
    d_all = compact_events(t)
    one, _ = merge_partition(None, d_all)

    first, _ = merge_partition(None, compact_events(t.slice(0, half)))
    two, _ = merge_partition(first, compact_events(t.slice(half)))

    import pyarrow.compute as pc

    def live_state(m):
        live = m.filter(pc.invert(m["_deleted"]))
        return {
            r["doc_id"]: (tuple(r["tokens"]), r["source"]) for r in live.to_pylist()
        }

    assert live_state(one) == live_state(two)
