"""Incremental near-duplicate (MinHash-LSH) index over the lake —
a secondary index mapping ``(band, band_key) -> live doc_ids``,
maintained per epoch from snapshot pre/post images (never a full
rebuild). It unifies the CDC engine with the fuzzy-dedup operators:
near-dup candidate lookup stays O(changed docs) per epoch instead of
an O(corpus) batch recompute.

Signatures are k MinHash permutations over a doc's DISTINCT int32
tokens with CLOSED-FORM universal-hash parameters (no RNG):

    P   = 2^31 - 1 (Mersenne prime)
    a_i = (2654435761 * (i+1)) mod P          i in [0, k)
    b_i = (97 + 31*i) mod P
    h_i(t) = (a_i * t + b_i) mod P
    sig_i(doc) = min over tokens t of h_i(t)

so a DuckDB replay over the same event stream reproduces every band
key exactly (registry oracle ``neardup_index_pairs``). Bands pack
r=2 signature rows losslessly into one int64 — ``bkey = s_hi * P +
s_lo`` (< 2^62, no collision hashing needed); two docs share a band
iff both of its permutation minima agree.

Layout: ``root/dupindex/epoch=E/bb=B/bands.parquet`` with rows
``(band:int32, bkey:int64, doc_id:string, lsn:int64, present:bool)``,
partitioned by ``bb = (bkey + band) % band_buckets``. A candidate
lookup reads only the probed band-buckets' chains and LWW-folds per
(band, bkey, doc_id) — the same chain-fold discipline as the lake and
the token index (lakecdc/index.py).

Maintenance for epoch E is partition-aligned on the LAKE side (one
task per lake partition loads the E-1 and E chains it already owns —
no shuffle to find what changed), then shuffles only the
O(changed-docs x bands) band-row deltas by band bucket. Retraction
(an update that changes a doc's tokens must stop the OLD band keys
from matching) works exactly like the token index: every changed doc
emits its old ∪ new band rows with ``present`` = membership in the
new band set, and the LWW fold by the doc's new LSN supersedes stale
rows without ever reading them.

Reference analogue: the keep-best-per-key dedup of
merge_support.py:150-180 generalized to fuzzy (token-set) identity,
made durable and incremental; SURVEY §2.7 D1/D2 as a maintained
side-structure rather than a per-run batch job.

Docs with an EMPTY live token set (possible under the partial engine's
delete fencing) are simply absent from the index — an empty set has no
MinHash signature and near-dups nothing.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from lakecdc import manifest
from lakecdc.config import EngineConfig, atomic_write
from lakecdc.index import (
    _latest_manifest_epoch,
    _live_token_state,
    _view_resident,
    complete_epochs,
)

MERSENNE_P = 2147483647  # 2^31 - 1
NUM_PERM = 16
BAND_ROWS = 2
NUM_BANDS = NUM_PERM // BAND_ROWS
DEFAULT_BAND_BUCKETS = 16

_I = np.arange(NUM_PERM, dtype=np.int64)
_A = (2654435761 * (_I + 1)) % MERSENNE_P
_B = (97 + 31 * _I) % MERSENNE_P

BAND_SCHEMA = pa.schema(
    [
        ("band", pa.int32()),
        ("bkey", pa.int64()),
        ("doc_id", pa.string()),
        ("lsn", pa.int64()),
        ("present", pa.bool_()),
    ]
)


def dupindex_dir(cfg: EngineConfig) -> str:
    return os.path.join(cfg.root, "dupindex")


def signatures(tok_arrays: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """MinHash signatures for an object array of int token arrays.
    Returns ``(mask, sig)`` where ``mask`` marks docs with a non-empty
    token set and ``sig`` is the (mask.sum(), NUM_PERM) int64 matrix —
    one vectorized hash of the flattened tokens + one
    ``minimum.reduceat`` per corpus, no per-doc Python."""
    lens = np.fromiter(
        (0 if t is None else len(t) for t in tok_arrays),
        dtype=np.int64,
        count=len(tok_arrays),
    )
    mask = lens > 0
    if not mask.any():
        return mask, np.empty((0, NUM_PERM), dtype=np.int64)
    nz = lens[mask]
    flat = np.concatenate(
        [np.asarray(t, dtype=np.int64) for t in tok_arrays[mask]]
    )
    # (k, L) hash matrix; min over each doc's contiguous segment.
    # min over the multiset == min over the set, so no dedup needed.
    h = (_A[:, None] * flat[None, :] + _B[:, None]) % MERSENNE_P
    starts = np.concatenate([[0], np.cumsum(nz)[:-1]])
    sig = np.minimum.reduceat(h, starts, axis=1).T  # (n_nonempty, k)
    return mask, sig


def band_keys(sig: np.ndarray) -> np.ndarray:
    """Pack each band's BAND_ROWS signature values into one int64
    losslessly: ``bkey = s_hi * P + s_lo`` (values < P so the packing
    is injective and < 2^62). Returns (n, NUM_BANDS) int64."""
    s = sig.reshape(len(sig), NUM_BANDS, BAND_ROWS)
    return s[:, :, 0] * MERSENNE_P + s[:, :, 1]


def _band_rows(
    doc_ids: np.ndarray, lsns: np.ndarray, toks: np.ndarray
) -> pd.DataFrame:
    """(doc_id, lsn, band, bkey) rows for every doc with tokens."""
    mask, sig = signatures(toks)
    if not mask.any():
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=object),
                "lsn": np.empty(0, dtype=np.int64),
                "band": np.empty(0, dtype=np.int64),
                "bkey": np.empty(0, dtype=np.int64),
            }
        )
    bk = band_keys(sig)
    n = int(mask.sum())
    return pd.DataFrame(
        {
            "doc_id": np.repeat(doc_ids[mask], NUM_BANDS),
            "lsn": np.repeat(lsns[mask], NUM_BANDS),
            "band": np.tile(np.arange(NUM_BANDS, dtype=np.int64), n),
            "bkey": bk.ravel(),
        }
    )


def _band_deltas(
    files_from: list[str], files_to: list[str], engine: str
) -> pa.Table:
    """One lake partition's band-row deltas between two chain states:
    for every doc whose winning LSN changed, one row per DISTINCT
    (band, bkey) of old ∪ new with the NEW membership. Same delta
    discipline as index._posting_deltas, over band keys instead of
    tokens."""
    to_df = _live_token_state(files_to, engine)
    fdf = _live_token_state(files_from, engine) if files_from else to_df.iloc[0:0]
    return _band_deltas_from_states(fdf, to_df)


def _band_deltas_from_states(fdf: pd.DataFrame, to_df: pd.DataFrame) -> pa.Table:
    """The pure delta kernel over two live-state frames
    ``(doc_id, _lsn, tokens)`` — property-tested directly
    (tests/test_property_kernels.py): any chain of state deltas,
    LWW-folded, must reproduce the final state's band rows."""
    old_lsn = pd.Series(
        fdf["_lsn"].to_numpy(dtype=np.int64), index=fdf["doc_id"], dtype="int64"
    )
    to_old = to_df["doc_id"].map(old_lsn)
    changed = (to_old != to_df["_lsn"]).to_numpy()  # NaN != x -> True
    gone = ~fdf["doc_id"].isin(to_df["doc_id"]).to_numpy(dtype=bool)
    ch = to_df[changed]
    go = fdf[gone]
    # NEW band rows (present): changed docs' new signatures
    new = _band_rows(
        ch["doc_id"].to_numpy(dtype=object),
        ch["_lsn"].to_numpy(dtype=np.int64),
        ch["tokens"].to_numpy(),
    )
    new["present"] = np.int8(1)
    # OLD band rows (absent unless re-asserted by an identical new
    # band): changed docs that existed before, plus gone docs. The
    # emitted LSN is always the NEW winning LSN (old+1 for vacuumed
    # docs) so the fold supersedes earlier epochs' rows.
    prev = fdf[fdf["doc_id"].isin(ch["doc_id"])]
    new_lsn = pd.Series(
        ch["_lsn"].to_numpy(dtype=np.int64), index=ch["doc_id"], dtype="int64"
    )
    old = _band_rows(
        np.concatenate(
            [prev["doc_id"].to_numpy(dtype=object), go["doc_id"].to_numpy(dtype=object)]
        ),
        np.concatenate(
            [
                prev["doc_id"].map(new_lsn).to_numpy(dtype=np.int64),
                go["_lsn"].to_numpy(dtype=np.int64) + 1,
            ]
        ),
        np.concatenate([prev["tokens"].to_numpy(), go["tokens"].to_numpy()]),
    )
    old["present"] = np.int8(0)
    both = pd.concat([new, old], ignore_index=True)
    if not len(both):
        return BAND_SCHEMA.empty_table()
    # one lexsort resolves dedup + membership: last row per
    # (doc, band, bkey) carries the max `present` flag
    d = both["doc_id"].to_numpy(dtype=object)
    codes, _ = pd.factorize(d)
    b = both["band"].to_numpy()
    k = both["bkey"].to_numpy()
    p = both["present"].to_numpy()
    order = np.lexsort((p, k, b, codes))
    codes, b, k, p = codes[order], b[order], k[order], p[order]
    lsn = both["lsn"].to_numpy()[order]
    d = d[order]
    keep = np.append(
        (codes[:-1] != codes[1:]) | (b[:-1] != b[1:]) | (k[:-1] != k[1:]), True
    )
    return pa.table(
        {
            "band": pa.array(b[keep].astype(np.int32)),
            "bkey": pa.array(k[keep]),
            "doc_id": pa.array(d[keep], type=pa.string()),
            "lsn": pa.array(lsn[keep]),
            "present": pa.array(p[keep].astype(bool)),
        },
        schema=BAND_SCHEMA,
    )


def update_dupindex(
    cfg: EngineConfig,
    epoch: int,
    band_buckets: int = DEFAULT_BAND_BUCKETS,
    from_epoch: int | None = "auto",  # type: ignore[assignment]
) -> int:
    """Maintain the index for one newly-committed epoch: partition-
    aligned delta extraction, then a band-bucket shuffle of just the
    band-row deltas, one atomically-written file per (epoch, bucket).
    Idempotent (deterministic content at deterministic paths). Returns
    the number of band rows written."""
    view_to = manifest.partition_view(cfg, epoch)
    if from_epoch == "auto":
        from_epoch = epoch - 1 if epoch > 0 else None
    view_from = (
        manifest.partition_view(cfg, from_epoch) if from_epoch is not None else {}
    )
    parts = sorted(set(view_to) | set(view_from))
    if not parts:
        return 0
    items = [
        {"from": list(view_from.get(p, [])), "to": list(view_to.get(p, []))}
        for p in parts
    ]
    engine = cfg.merge_engine
    root = dupindex_dir(cfg)

    def deltas(batch: pa.Table) -> pa.Table:
        tables = [
            _band_deltas(row["from"], row["to"], engine)
            for row in batch.to_pylist()
        ]
        t = pa.concat_tables(tables) if tables else BAND_SCHEMA.empty_table()
        bb = (
            t["bkey"].to_numpy(zero_copy_only=False)
            + t["band"].to_numpy(zero_copy_only=False)
        ) % band_buckets
        return t.append_column("bb", pa.array(bb.astype(np.int64)))

    def write_bb(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64())})
        bb = int(group["bb"][0].as_py())
        sub = group.drop_columns(["bb"]).sort_by(
            [
                ("band", "ascending"),
                ("bkey", "ascending"),
                ("doc_id", "ascending"),
                ("lsn", "ascending"),
            ]
        )
        path = os.path.join(
            root, f"epoch={epoch:09d}", f"bb={bb:05d}", "bands.parquet"
        )
        atomic_write(path, lambda tmp: pq.write_table(sub, tmp))
        return pa.table({"n": pa.array([sub.num_rows], type=pa.int64())})

    counts = (
        rd.from_items(items)
        .map_batches(deltas, batch_size=1, batch_format="pyarrow")
        .groupby("bb")
        .map_groups(write_bb, batch_format="pyarrow")
        .to_pandas()
    )
    from lakecdc.index import _auto_compact

    _auto_compact(cfg, compact_dupindex)
    return int(counts["n"].sum()) if len(counts) else 0


def build_dupindex(
    cfg: EngineConfig, band_buckets: int = DEFAULT_BAND_BUCKETS
) -> int:
    """Index every fully-committed epoch in order — the incremental
    maintenance loop a `--follow` tail runs after each apply.
    Residency-aware like index.build_index: compacted-away epochs are
    skipped; the first resident snapshot is indexed FULL."""
    total = 0
    prev: int | None = None
    for e in complete_epochs(cfg):
        if not _view_resident(manifest.partition_view(cfg, e)):
            continue
        if prev is None:
            total += update_dupindex(cfg, e, band_buckets, from_epoch=None)
        else:
            total += update_dupindex(cfg, e, band_buckets, from_epoch=prev)
        prev = e
    if prev is None:
        latest = _latest_manifest_epoch(cfg)
        if latest is not None:
            total += update_dupindex(cfg, latest, band_buckets, from_epoch=None)
    return total


def compact_dupindex(cfg: EngineConfig, over: int = 1) -> dict[int, int]:
    """Fold each band-bucket's chain into a single base file (dropping
    absent rows) so gate/lookup cost stays O(1) files per probe instead
    of O(epochs) — the lake's own chain-fold discipline applied to this
    index (see index._compact_chains). Incremental maintenance stacks
    later epochs' deltas on top; compact again when the chain regrows.
    ``over`` > 1 = continuous-tail policy: fold only chains longer than
    ``over`` files (bounded read amplification, no per-epoch re-fold)."""
    from lakecdc.index import _compact_chains

    return _compact_chains(
        dupindex_dir(cfg), "bb", ["band", "bkey", "doc_id"], BAND_SCHEMA,
        over=over,
    )


def _bucket_files(cfg: EngineConfig, bb: int, up_to_epoch: int | None) -> list[str]:
    files = sorted(
        glob.glob(
            os.path.join(dupindex_dir(cfg), "epoch=*", f"bb={bb:05d}", "*.parquet")
        )
    )
    if up_to_epoch is not None:
        files = [
            f
            for f in files
            if int(f.split("epoch=")[1].split(os.sep)[0]) <= up_to_epoch
        ]
    return files


def _fold_live(df: pd.DataFrame) -> pd.DataFrame:
    """LWW-fold one bucket's chain: last row per (band, bkey, doc_id)
    by LSN wins; keep present. Vectorized (one stable sort)."""
    if not len(df):
        return df.iloc[0:0]
    df = df.sort_values("lsn", kind="stable")
    last = df.groupby(["band", "bkey", "doc_id"], sort=False).tail(1)
    return last[last["present"]]


def lookup_neardup(
    cfg: EngineConfig,
    tokens: list[int] | np.ndarray,
    band_buckets: int = DEFAULT_BAND_BUCKETS,
    up_to_epoch: int | None = None,
) -> pd.DataFrame:
    """Candidate near-duplicates of a QUERY token set: compute its
    signature, read only the probed (band, bkey) buckets' chains,
    LWW-fold, and return ``(doc_id, n_bands)`` — docs sharing >= 1
    band, with how many bands agree (monotone in estimated Jaccard).
    This is the ingest-time "does this new doc near-dup anything
    already live?" check, at point-read cost."""
    toks = np.asarray([np.asarray(tokens, dtype=np.int64)], dtype=object)
    mask, sig = signatures(toks)
    if not mask.any():
        return pd.DataFrame({"doc_id": [], "n_bands": []})
    bk = band_keys(sig)[0]
    hits: list[pd.DataFrame] = []
    for band in range(NUM_BANDS):
        bb = int((bk[band] + band) % band_buckets)
        files = _bucket_files(cfg, bb, up_to_epoch)
        if not files:
            continue
        t = pa.concat_tables([pq.read_table(f) for f in files])
        df = t.to_pandas()
        df = df[(df["band"] == band) & (df["bkey"] == bk[band])]
        live = _fold_live(df)
        if len(live):
            hits.append(live[["doc_id"]])
    if not hits:
        return pd.DataFrame({"doc_id": [], "n_bands": []})
    allh = pd.concat(hits, ignore_index=True)
    out = (
        allh.groupby("doc_id", sort=True).size().reset_index(name="n_bands")
    )
    return out


def gate_epoch(
    cfg: EngineConfig,
    epoch: int,
    band_buckets: int = DEFAULT_BAND_BUCKETS,
    up_to_epoch: int | None = None,
) -> pd.DataFrame:
    """Ingest-time near-dup GATE: which docs arriving in WAL ``epoch``
    would near-duplicate an EXISTING live doc — answered from the
    index state as of ``up_to_epoch`` (default ``epoch - 1``) BEFORE
    the epoch is applied. This is the dedup-at-ingest stage of a
    training-data pipeline (drop/flag near-dups as they arrive instead
    of re-sweeping the corpus), priced at delta scale:

      1. stream the epoch's events; batch-local LWW combine
         (merge.compact_events) so at most one row per doc per batch
         survives;
      2. ONE delta-scale shuffle by ``hash(doc_id)`` (64 shards) folds
         global winners per incoming doc (drop deletes / token-less
         docs) and computes their band rows ONCE per doc — under key
         skew a hot doc's signature is computed once, not once per
         batch it appeared in;
      3. ONE delta-scale shuffle by band bucket matches each band row
         against that bucket's folded chain — the LAKE-scale side is
         never shuffled, each group point-reads only its own bucket's
         chain files.

    Returns (doc_id, matched_doc, n_bands): incoming doc, existing
    live doc sharing >= 1 band, and how many bands agree (monotone in
    estimated Jaccard). Self-matches (an update arriving for a doc
    already live) are excluded."""
    from lakecdc import wal
    from lakecdc.merge import compact_events
    from lakecdc.shuffle import bucket_of

    if up_to_epoch is None:
        up_to_epoch = epoch - 1
    root = dupindex_dir(cfg)
    ds = wal.read_segment(cfg, epoch)
    doc_shards = max(band_buckets, 64)

    def combine(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = [c for c in ("lsn", "op", "doc_id", "tokens") if c in t.column_names]
        t = t.select(keep)
        # malformed events (null key/lsn) can't gate — the apply path
        # counts them into lineage; here they are simply not candidates
        t = t.filter(
            pc.and_(pc.is_valid(t["doc_id"]), pc.is_valid(t["lsn"]))
        )
        t = compact_events(t)
        db = bucket_of(t["doc_id"], doc_shards)
        return t.append_column("db", pa.array(db.astype(np.int64)))

    def winners_to_bands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("lsn", kind="stable")
        last = g.groupby("doc_id", sort=False).tail(1)
        live = last[last["op"] != "delete"]
        rows = _band_rows(
            live["doc_id"].to_numpy(dtype=object),
            live["lsn"].to_numpy(dtype=np.int64),
            live["tokens"].to_numpy(),
        )
        rows["bb"] = (rows["bkey"] + rows["band"]) % band_buckets
        return rows[["doc_id", "band", "bkey", "bb"]]

    def match(g: pd.DataFrame) -> pd.DataFrame:
        bb = int(g["bb"].iloc[0])
        files = _bucket_files(cfg, bb, up_to_epoch)
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="object"),
                "matched_doc": pd.Series(dtype="object"),
                "band": pd.Series(dtype="int64"),
            }
        )
        if not files:
            return out
        t = pa.concat_tables([pq.read_table(f) for f in files])
        live = _fold_live(t.to_pandas())
        if not len(live):
            return out
        hit = g.merge(
            live[["band", "bkey", "doc_id"]].rename(
                columns={"doc_id": "matched_doc"}
            ),
            on=["band", "bkey"],
            how="inner",
        )
        hit = hit[hit["doc_id"] != hit["matched_doc"]]
        return hit[["doc_id", "matched_doc", "band"]].astype({"band": "int64"})

    hits = (
        # 1M-event combine batches: ~2x fewer winner rows reach the
        # doc shuffle than per-segment batches under Zipf skew, for
        # ~0.2s of extra map-side CPU (measured on the 32M-event bench
        # epoch; see BASELINE.md)
        ds.map_batches(
            combine,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1_000_000,
        )
        .groupby("db")
        .map_groups(winners_to_bands, batch_format="pandas")
        .groupby("bb")
        .map_groups(match, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in hits.columns or not len(hits):
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="object"),
                "matched_doc": pd.Series(dtype="object"),
                "n_bands": pd.Series(dtype="int64"),
            }
        )
    out = (
        hits.groupby(["doc_id", "matched_doc"], sort=True)
        .size()
        .reset_index(name="n_bands")
    )
    return out


def live_pairs(
    cfg: EngineConfig,
    band_buckets: int = DEFAULT_BAND_BUCKETS,
    up_to_epoch: int | None = None,
) -> pd.DataFrame:
    """All candidate near-dup pairs among LIVE docs: fold every band
    bucket's chain and emit docs sharing a (band, bkey). One Ray
    groupby over the bucket id — the fold and the pair emission are
    vectorized inside each group; output is pair-scale (near-dup docs
    only), collected to the driver like the other pair queries.

    Returns distinct (doc_a, doc_b) string doc ids with doc_a < doc_b
    (lexicographic — callers with numeric ids re-canonicalize)."""
    items = [
        {"bb": bb, "files": _bucket_files(cfg, bb, up_to_epoch)}
        for bb in range(band_buckets)
    ]
    items = [it for it in items if it["files"]]
    empty = pd.DataFrame(
        {"doc_a": pd.Series(dtype="object"), "doc_b": pd.Series(dtype="object")}
    )
    if not items:
        return empty

    def bucket_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for files in batch["files"]:
            t = pa.concat_tables([pq.read_table(f) for f in list(files)])
            live = _fold_live(t.to_pandas())
            if not len(live):
                continue
            # emit pairs within each (band, bkey) group: sort by doc so
            # triu indices over the sorted array are already canonical
            # (doc_a < doc_b), then the m*(m-1)/2 combinations
            live = live.sort_values(["band", "bkey", "doc_id"], kind="stable")
            g = live.groupby(["band", "bkey"], sort=False)["doc_id"]
            for _, docs in g:
                arr = docs.to_numpy(dtype=object)
                if len(arr) < 2:
                    continue
                ii, jj = np.triu_indices(len(arr), k=1)
                outs.append(
                    pd.DataFrame({"doc_a": arr[ii], "doc_b": arr[jj]})
                )
        if not outs:
            return empty.copy()
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    pairs = (
        rd.from_items(items)
        .map_batches(bucket_pairs, batch_size=1, batch_format="pandas")
        .to_pandas()
    )
    if "doc_a" not in pairs.columns:  # all buckets pair-free: schema lost
        return empty
    return (
        pairs.drop_duplicates()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
