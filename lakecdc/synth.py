"""Deterministic synthetic WAL generator.

The engine's test/bench input: a change stream of insert/update/delete/
upsert events over a universe of ``doc_id`` keys carrying token-array
payloads, written as one Parquet segment directory per epoch under
``<wal_dir>/epoch=NNNNNNNNN/``.

Determinism: every epoch is generated from ``default_rng([seed, epoch])``
so content is independent of generation order and identical across
processes/scales — the replay oracle and the engine must agree on exact
token arrays (BASELINE.json: per-row token-array equality).

Key skew is Zipf-distributed (hot doc_ids), exercising the combiner
path in lakecdc.shuffle. Epochs at/after ``evolution_epoch`` carry the
additive `source` column (WAL v1); earlier epochs are v0 — the
schema-evolution axis.

Reference analogue: the reference ships no fixtures; its inputs are the
FEC bulk files themselves (~20 GB/cycle). This generator plays the role
of those files at parameterized scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lakecdc.config import atomic_write
from lakecdc.schemas import WAL_SCHEMA_V0, WAL_SCHEMA_V1

_OPS = np.array(["insert", "update", "delete", "upsert"])
_OP_P = np.array([0.15, 0.10, 0.05, 0.70])


def _token_lists(
    rng: np.random.Generator, n: int, mean_tokens: int, vocab: int
) -> pa.ListArray:
    """Vectorized list<int32> column: lengths in [1, 2*mean), values in
    [0, vocab). Built from one flat buffer + offsets — no Python loop."""
    lengths = rng.integers(1, 2 * mean_tokens, size=n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = rng.integers(0, vocab, size=int(offsets[-1]), dtype=np.int32)
    return pa.LargeListArray.from_arrays(offsets, pa.array(flat)).cast(
        pa.list_(pa.int32())
    )


def generate_segment(
    epoch: int,
    segment: int = 0,
    n_segments: int = 1,
    *,
    n_docs: int,
    events_per_epoch: int,
    seed: int = 42,
    zipf_a: float = 1.3,
    mean_tokens: int = 48,
    vocab: int = 50_257,
    evolution_epoch: int | None = None,
    p_invalid: float = 0.0,
    p_patch: float = 0.0,
) -> pa.Table:
    """One SEGMENT of one epoch's events (contiguous LSN sub-range),
    independently seeded by (seed, epoch, segment) so segments generate
    in parallel with bounded memory and content independent of how many
    other segments exist."""
    rows_per = -(-events_per_epoch // n_segments)
    lo = segment * rows_per
    n = min(rows_per, events_per_epoch - lo)
    if n <= 0:
        return (
            WAL_SCHEMA_V1
            if evolution_epoch is not None and epoch >= evolution_epoch
            else WAL_SCHEMA_V0
        ).empty_table()
    rng = np.random.default_rng([seed, epoch, segment])
    lsn_lo = epoch * events_per_epoch + lo + 1
    lsn = np.arange(lsn_lo, lsn_lo + n, dtype=np.int64)
    # Zipf-skewed key choice folded into the doc universe (hot keys).
    doc_idx = (rng.zipf(zipf_a, size=n) - 1) % n_docs
    doc_id = np.char.add("doc", np.char.zfill(doc_idx.astype("U8"), 8))
    op = _OPS[rng.choice(len(_OPS), size=n, p=_OP_P)]
    tokens = _token_lists(rng, n, mean_tokens, vocab)
    n_tok = pa.compute.cast(pa.compute.list_value_length(tokens), pa.int32())

    evolved = evolution_epoch is not None and epoch >= evolution_epoch
    cols = {
        "lsn": pa.array(lsn),
        "op": pa.array(op),
        "doc_id": pa.array(doc_id),
        "tokens": tokens,
        "n_tok": n_tok,
    }
    if evolved:
        src = np.char.add("src", rng.integers(0, 5, size=n).astype("U1"))
        cols["source"] = pa.array(src)
    table = pa.table(cols, schema=WAL_SCHEMA_V1 if evolved else WAL_SCHEMA_V0)

    if p_invalid > 0:
        # Corrupt a deterministic subset: bad op codes and null tokens on
        # upserts — exercises validate_events' counted-drop path.
        bad = rng.random(n) < p_invalid
        op2 = op.copy()
        op2[bad & (rng.random(n) < 0.5)] = "garbage"
        table = table.set_column(1, "op", pa.array(op2))
        tok_mask = bad & (op2 != "garbage") & (op2 != "delete")
        if tok_mask.any():
            toks = table["tokens"].combine_chunks()
            keep = pa.array(~tok_mask)
            toks = pa.compute.if_else(
                keep, toks, pa.nulls(n, type=pa.list_(pa.int32()))
            )
            table = table.set_column(3, "tokens", toks)

    if p_patch > 0:
        # Partial-update stream: a fraction of events become patches
        # that set only a subset of fields (tokens-only, source-only,
        # or both) — the merge_engine="partial" exercise.
        pc2 = pa.compute
        op_np = table["op"].combine_chunks().to_numpy(zero_copy_only=False)
        is_p = (rng.random(n) < p_patch) & (op_np != "garbage")
        cur_op = op_np.astype(object)
        cur_op[is_p] = "patch"
        table = table.set_column(1, "op", pa.array(cur_op.astype(str)))
        u = rng.random(n)
        toks = table["tokens"].combine_chunks()
        if evolved:
            tok_null = is_p & (u < 0.35)  # source-only patch
            src_null = is_p & (u >= 0.35) & (u < 0.7)  # tokens-only patch
            src = pc2.if_else(
                pa.array(~src_null),
                table["source"].combine_chunks(),
                pa.nulls(n, type=pa.string()),
            )
            table = table.set_column(
                table.schema.get_field_index("source"), "source", src
            )
        else:
            tok_null = np.zeros(n, dtype=bool)  # v0 patches: tokens-only
        toks = pc2.if_else(
            pa.array(~tok_null), toks, pa.nulls(n, type=pa.list_(pa.int32()))
        )
        table = table.set_column(3, "tokens", toks)
        table = table.set_column(
            4, "n_tok", pc2.cast(pc2.list_value_length(toks), pa.int32())
        )
    return table


def write_segment(
    wal_dir: str, epoch: int, segment: int, n_segments: int, **kwargs
) -> str | None:
    table = generate_segment(epoch, segment, n_segments, **kwargs)
    if table.num_rows == 0:
        return None
    edir = os.path.join(wal_dir, f"epoch={epoch:09d}")
    os.makedirs(edir, exist_ok=True)
    p = os.path.join(edir, f"seg-{segment:03d}.parquet")
    from lakecdc.schemas import wal_write_options

    atomic_write(
        p, lambda tmp: pq.write_table(table, tmp, **wal_write_options(table.schema))
    )
    return p


def write_wal(
    wal_dir: str,
    *,
    n_docs: int,
    n_epochs: int,
    events_per_epoch: int,
    seed: int = 42,
    segments_per_epoch: int = 4,
    parallel: bool = False,
    **epoch_kwargs,
) -> list[str]:
    """Materialize the WAL: ``wal_dir/epoch=NNNNNNNNN/seg-K.parquet``.
    Multiple segment files per epoch so the Ray read parallelizes;
    ``parallel=True`` generates segments as Ray tasks (requires an
    initialized Ray; content is identical either way)."""
    kwargs = dict(
        n_docs=n_docs,
        events_per_epoch=events_per_epoch,
        seed=seed,
        **epoch_kwargs,
    )
    n_seg = max(1, min(segments_per_epoch, events_per_epoch))
    jobs = [(e, k) for e in range(n_epochs) for k in range(n_seg)]
    if parallel:
        import ray

        w = ray.remote(write_segment)
        paths = ray.get(
            [w.remote(wal_dir, e, k, n_seg, **kwargs) for e, k in jobs]
        )
    else:
        paths = [write_segment(wal_dir, e, k, n_seg, **kwargs) for e, k in jobs]
    return [p for p in paths if p]
