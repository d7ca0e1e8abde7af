"""Persistent semantic near-dup index — the embedding analogue of
``dupindex`` (MinHash band-bucket chains): frozen IVF centroids plus
per-cluster parquet shard chains, maintained INCREMENTALLY per ingest
epoch so the semantic ingest gate never retrains or rescans the
corpus. ``cluster.semantic_gate`` is the one-shot form (train + probe
in one call); this module is its 100-TB lifecycle — build once, then
per epoch: ``update_semindex`` (assign the delta with the frozen
centroids, append one bounded shard chain link per touched cluster),
``gate_semindex`` (probe ONLY the delta's assigned clusters via
bounded row-group tiles), auto-compaction when a chain grows past the
policy threshold. Reference analogue: the reference re-reads its full
inputs every cycle (scripts/run_all.py); here maintenance is
O(delta × cluster-shard), never O(corpus).

Layout (all content deterministic at deterministic paths, so every
step is idempotent and crash-rerunnable — the dupindex discipline):

    root/meta.json                      frozen params (k, iters, mod,
                                        d, flush_rows, compact_over,
                                        train_rems)
    root/centroids.parquet              frozen int64 centroids
    root/epoch=E/cl=C/vecs.parquet      epoch E's vectors assigned to
                                        cluster C: (vec_id, v) sorted
                                        by vec_id, unit-normalized
                                        float64, row_group_size =
                                        flush_rows (each row group is
                                        one bounded probe shard)
    root/epoch=E/cl=C/base.parquet      compacted fold of the chain
                                        up to epoch E

Read rule (crash-safe WITHOUT an LWW fold): per cluster, the live set
is the newest ``base.parquet`` (at epoch B) plus every non-base chain
file at epoch > B. Files at epoch <= B are superseded — whether or
not a crashed compaction finished deleting them — so a straggler can
never double-count a vector. The index is APPEND-ONLY by contract
(embedding corpora are content-addressed: a changed document arrives
as a new vec_id), the same contract the one-shot gate assumes.
RTBF-style erasure: ``forget_semindex`` registers vec_ids in
``root/forgotten.json`` (a permanent fence — gate/search exclude
them at read time immediately, and a re-ingested epoch can never
resurrect them), then physical bytes disappear at the next fold
(``vacuum=True`` forces a full fold right away);
``assert_forgotten_semindex`` is the byte-level audit — the lake's
forget/fence/audit discipline applied to this index.

The epoch split over the synthetic ``embeddings`` table is
vec_id % mod == epoch — the deterministic stand-in for per-epoch
delta tables, exactly like semantic_gate's existing/incoming split.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from lakecdc.config import atomic_write
from lakecdc.qutil import read, table_path

# v2: epochs commit via _done markers and the read rule ignores
# uncommitted chain files — a v1 index (no markers) would silently
# read empty under v2 code, so the version is CHECKED on every load.
SCHEMA_VERSION = 2


def _meta_path(root: str) -> str:
    return os.path.join(root, "meta.json")


def _load_meta(root: str) -> dict:
    with open(_meta_path(root)) as f:
        meta = json.load(f)
    if meta.get("version") != SCHEMA_VERSION:
        raise ValueError(
            f"semindex at {root!r} has on-disk version "
            f"{meta.get('version')!r}, this code reads version "
            f"{SCHEMA_VERSION} — rebuild the index (the commit-marker "
            "read rule changed; silently reading it would drop chains)"
        )
    return meta


def _load_centroids(root: str) -> np.ndarray:
    t = pq.read_table(os.path.join(root, "centroids.parquet"))
    d = t.schema.field("c").type.list_size
    return (
        t["c"].combine_chunks().values.to_numpy(zero_copy_only=False)
        .astype(np.int64)
        .reshape(t.num_rows, d)
    )


def _file_epoch(root: str, f: str) -> int:
    """Epoch of one chain file, parsed from its path RELATIVE to the
    index root — an index root that itself sits under some epoch=N
    directory (e.g. inside a lake's layout) must not mis-parse."""
    return int(os.path.relpath(f, root).split("epoch=")[1].split(os.sep)[0])


def _done_path(root: str, rem: int) -> str:
    return os.path.join(root, f"epoch={rem:09d}", "_done.json")


def epoch_done(root: str, rem: int) -> bool:
    """True iff ``rem``'s ingest committed (its _done marker landed).
    The markers are the index's applied-epoch registry: chain files of
    an UNcommitted epoch are in-flight — invisible to reads, exempt
    from folding/hygiene — so a crash mid-update never exposes or
    loses a partial epoch (rerun rewrites it deterministically and
    then commits)."""
    return os.path.exists(_done_path(root, rem))


def _fold_point(root: str) -> int:
    """The newest base file's epoch across all clusters (-1 if never
    compacted): ingest below this is refused (see update_semindex)."""
    bases = glob.glob(os.path.join(root, "epoch=*", "cl=*", "base.parquet"))
    return max((_file_epoch(root, f) for f in bases), default=-1)


def live_files(root: str) -> dict[int, list[str]]:
    """Per-cluster live chain: the newest base (fold point B) plus
    non-base files of COMMITTED epochs > B. Superseded files
    (epoch <= B) are ignored even if a crashed compaction left them on
    disk; uncommitted epochs (no _done marker) are in-flight and
    invisible."""
    chains: dict[int, list[tuple[int, bool, str]]] = {}
    done: dict[int, bool] = {}
    for f in sorted(glob.glob(os.path.join(root, "epoch=*", "cl=*", "*.parquet"))):
        e = _file_epoch(root, f)
        if e not in done:
            done[e] = epoch_done(root, e)
        is_base = os.path.basename(f) == "base.parquet"
        if not is_base and not done[e]:
            continue  # in-flight epoch: invisible until committed
        c = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        chains.setdefault(c, []).append((e, is_base, f))
    out: dict[int, list[str]] = {}
    for c, entries in chains.items():
        bases = [(e, f) for e, is_b, f in entries if is_b]
        b = max(e for e, _ in bases) if bases else -1
        live = [f for e, f in bases if e == b]
        live += [f for e, is_b, f in entries if not is_b and e > b]
        out[c] = sorted(live)
    return out


def _forgotten_path(root: str) -> str:
    return os.path.join(root, "forgotten.json")


def load_forgotten(root: str) -> np.ndarray:
    """The index's RTBF fence: sorted int64 vec_ids that every read
    excludes and every fold physically drops. Absent file = empty."""
    p = _forgotten_path(root)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    with open(p) as f:
        return np.asarray(sorted(json.load(f)), dtype=np.int64)


def forget_semindex(
    root: str, vec_ids, *, vacuum: bool = True
) -> int:
    """Right-to-be-forgotten over index vectors: union ``vec_ids``
    into the permanent forgotten fence (idempotent, atomic). The
    fence takes effect IMMEDIATELY on gate/search reads, and — because
    reads and folds both consult it — a crashed or re-run
    ``update_semindex`` of an old epoch can never resurrect a
    forgotten vector. ``vacuum=True`` forces a full fold right away so
    the bytes physically leave disk (otherwise the next compaction
    drops them). Returns the fence size."""
    cur = set(load_forgotten(root).tolist())
    cur.update(int(v) for v in vec_ids)
    atomic_write(
        _forgotten_path(root),
        lambda tmp: open(tmp, "w").write(json.dumps(sorted(cur))),
    )
    if vacuum:
        want = np.asarray(sorted(cur), dtype=np.int64)
        live_set = {f for fs in live_files(root).values() for f in fs}
        victims_in: set[int] = set()
        for f in sorted(
            glob.glob(os.path.join(root, "epoch=*", "cl=*", "*.parquet"))
        ):
            got = pq.read_table(f, columns=["vec_id"])["vec_id"].to_numpy()
            if not len(np.intersect1d(got, want)):
                continue  # clean file: no rewrite needed
            if f in live_set:
                victims_in.add(
                    int(os.path.basename(os.path.dirname(f)).split("=")[1])
                )
            else:
                # superseded straggler or uncommitted in-flight file
                # holding victim bytes: both are regenerable (the read
                # rule ignores them; a crashed update's rerun rewrites
                # deterministically, now fence-filtered) — delete.
                try:
                    os.remove(f)
                except FileNotFoundError:
                    pass
        # fold ONLY the clusters that actually hold victim bytes —
        # a single-row RTBF request must not rewrite the whole index
        compact_semindex(root, over=1, force=True, clusters=victims_in)
    return len(cur)


def assert_forgotten_semindex(root: str, vec_ids) -> None:
    """Byte-level erasure audit: scan EVERY chain file on disk — live,
    superseded stragglers AND uncommitted in-flight files — and raise
    if any forgotten id's bytes survive anywhere under the root (the
    lake's assert_forgotten applied to this index). Run after a
    vacuum-fold."""
    want = np.asarray(sorted({int(v) for v in vec_ids}), dtype=np.int64)
    for f in sorted(glob.glob(os.path.join(root, "epoch=*", "cl=*", "*.parquet"))):
        got = pq.read_table(f, columns=["vec_id"])["vec_id"].to_numpy()
        hit = np.intersect1d(got, want)
        if len(hit):
            raise AssertionError(
                f"forgotten vec_ids {hit.tolist()} still present in "
                f"{f} — vacuum-fold did not erase them"
            )


def _live_row_group_cells(root: str) -> dict[int, list]:
    """The on-disk index as probe cells: one ('pq', path, row_group)
    descriptor per live row group (dedup._fetch_shard resolves them) —
    ONE enumeration shared by gate_semindex and search_semindex so the
    read rule can never diverge between the two serve paths. When the
    RTBF fence is non-empty, every descriptor carries its broadcast
    ref so forgotten vectors are filtered AT the read boundary — even
    before a vacuum-fold has physically erased them."""
    import ray

    forgotten = load_forgotten(root)
    excl_ref = ray.put(forgotten) if len(forgotten) else None
    cells: dict[int, list] = {}
    for c, files in live_files(root).items():
        for f in files:
            for rg in range(pq.ParquetFile(f).num_row_groups):
                desc = (
                    ("pq", f, rg)
                    if excl_ref is None
                    else ("pq", f, rg, excl_ref)
                )
                cells.setdefault(c, []).append(desc)
    return cells


def build_semindex(
    root: str,
    sf_dir: str,
    *,
    k: int = 8,
    iters: int = 5,
    mod: int = 4,
    train_rems: tuple[int, ...] = (0, 1),
    ingest_rems: tuple[int, ...] | None = None,
    flush_rows: int = 4096,
    compact_over: int = 8,
) -> int:
    """Train the frozen centroids on the ``train_rems`` subset (exact
    int64 Lloyd — bit-identical to the single-process and SQL
    replays), persist them, then ingest ``ingest_rems`` (default: the
    training epochs) through the SAME ``update_semindex`` path every
    later epoch uses. Returns total vectors ingested. At corpus scale
    k follows SemDeDup's sizing rule (~10k-100k cells at 100M+ docs,
    see cluster.semantic_dedup) so per-cluster chains stay
    tile-friendly. Refuses a non-empty index root: a stale compacted
    base at a high epoch would supersede the fresh build's chains
    silently (delete the root, or point elsewhere)."""
    from lakecdc.cluster import _init_centroids, _lloyd, _quantized_corpus

    if os.path.exists(_meta_path(root)) or glob.glob(
        os.path.join(root, "epoch=*")
    ):
        raise ValueError(
            f"semindex root {root!r} is not empty — refusing to build over "
            "an existing index (its compacted bases would supersede the "
            "fresh chains); remove it or build elsewhere"
        )

    side = (mod, tuple(train_rems), True)
    C = _init_centroids(sf_dir, k, side=side)
    d = C.shape[1]
    ds = _quantized_corpus(sf_dir, side=side, d=d)
    C = _lloyd(ds, C, iters)

    meta = {
        "version": SCHEMA_VERSION,
        "k": k,
        "iters": iters,
        "mod": mod,
        "d": d,
        "flush_rows": flush_rows,
        "compact_over": compact_over,
        "train_rems": list(train_rems),
    }
    atomic_write(
        os.path.join(root, "centroids.parquet"),
        lambda tmp: pq.write_table(
            pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "c": pa.FixedSizeListArray.from_arrays(pa.array(C.ravel()), d),
                }
            ),
            tmp,
        ),
    )
    atomic_write(
        _meta_path(root), lambda tmp: open(tmp, "w").write(json.dumps(meta))
    )

    total = 0
    # ascending order: a mid-build auto-compaction can then never put
    # the fold point above a not-yet-ingested epoch (which update's
    # out-of-order guard would refuse, stranding the build half-done)
    for rem in sorted(set(ingest_rems if ingest_rems is not None else train_rems)):
        total += update_semindex(root, sf_dir, rem)
    return total


def update_semindex(root: str, sf_dir: str, rem: int) -> int:
    """Ingest one epoch's delta: assign each delta vector to its
    nearest frozen centroid (the exact int64 rule the oracle replays),
    unit-normalize, and append ONE chain file per touched cluster —
    (vec_id, v) sorted by vec_id, row_group_size=flush_rows so every
    row group is a bounded probe shard. Fully distributed (one
    map_batches assignment pass + a cluster-keyed map_groups write),
    idempotent (deterministic content at deterministic paths), and
    O(delta), never O(corpus). The epoch COMMITS via an atomic _done
    marker after all chain files landed — reads/folds ignore
    uncommitted epochs, so a crash mid-update never exposes or loses a
    partial epoch (rerun rewrites deterministically, then commits).
    Auto-compacts any chain past the ``compact_over`` policy
    afterwards (the index._auto_compact discipline). Returns vectors
    written.

    Epoch ORDER is enforced against the fold point: a never-committed
    epoch numbered at or below the newest base would be silently
    superseded by the read rule, so it is refused instead (ingest
    epochs in non-decreasing order once compaction has run — the same
    monotone-feed contract the lake's WAL has). Re-running a COMMITTED
    epoch stays allowed and idempotent. Single-follower discipline
    (one maintainer per index), like dupindex."""
    import ray

    from lakecdc.cluster import _assign, _quantize, _side_mask

    meta = _load_meta(root)
    mod, d, flush_rows = meta["mod"], meta["d"], meta["flush_rows"]
    fp = _fold_point(root)
    if rem <= fp and not epoch_done(root, rem):
        raise ValueError(
            f"epoch {rem} is at or below the index's fold point {fp} and "
            "was never committed — its files would be superseded unread. "
            "Ingest epochs in non-decreasing order once compaction has run."
        )
    cref = ray.put(_load_centroids(root))
    # the RTBF fence applies at ingest too: a re-run (crash recovery)
    # or a late epoch carrying a forgotten vec_id must never write its
    # bytes back to disk
    forgotten = load_forgotten(root)

    def assign(t: pa.Table) -> pa.Table:
        import ray as _ray

        ids = t["vec_id"].to_numpy()
        m = _side_mask(ids, (mod, rem, True))
        if len(forgotten):
            m &= ~np.isin(ids, forgotten)
        if not m.all():
            t = t.filter(pa.array(m))
        if len(t) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "v": pa.FixedSizeListArray.from_arrays(
                        pa.array([], type=pa.float64()), d
                    ),
                }
            )
        X = _quantize(t["embedding"])
        a = _assign(X, _ray.get(cref))
        emb = t["embedding"].combine_chunks()
        V = (
            emb.values.to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(t), d)
        )
        Vn = V / np.maximum(np.linalg.norm(V, axis=1), 1e-30)[:, None]
        return pa.table(
            {
                "vec_id": pa.array(
                    t["vec_id"].to_numpy().astype(np.int64), type=pa.int64()
                ),
                "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
                "v": pa.FixedSizeListArray.from_arrays(pa.array(Vn.ravel()), d),
            }
        )

    def write_cluster(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64())})
        c = int(g["cluster"][0].as_py())
        sub = g.drop_columns(["cluster"]).sort_by([("vec_id", "ascending")])
        path = os.path.join(root, f"epoch={rem:09d}", f"cl={c:05d}", "vecs.parquet")
        atomic_write(
            path, lambda tmp: pq.write_table(sub, tmp, row_group_size=flush_rows)
        )
        return pa.table({"n": pa.array([sub.num_rows], type=pa.int64())})

    counts = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(write_cluster, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(counts["n"].sum()) if len(counts) else 0
    # the commit point: the epoch becomes visible all-or-nothing
    atomic_write(
        _done_path(root, rem),
        lambda tmp: open(tmp, "w").write(json.dumps({"rem": rem, "rows": n})),
    )
    over = meta.get("compact_over", 0)
    if over and over > 0:
        compact_semindex(root, over=over)
    return n


def compact_semindex(
    root: str,
    over: int = 1,
    force: bool = False,
    clusters: set[int] | None = None,
) -> dict[int, int]:
    """Fold every cluster chain longer than ``over`` live files into a
    single ``base.parquet`` at the chain's top epoch (row groups stay
    flush_rows-bounded, so probe tiles are unaffected), dropping any
    RTBF-forgotten vectors, then delete the superseded files. Crash
    between the base write and the deletes is benign: the read rule
    already ignores files at epoch <= the fold point, and the next
    compaction sweep removes stragglers. ``force=True`` folds live
    chains regardless of length (so forgotten bytes physically leave
    even a single already-folded base); ``clusters`` restricts the
    force-fold to the named clusters — forget passes only the victim
    clusters, so a single-row RTBF request never rewrites the whole
    index. Returns {cluster: live rows} for folded clusters."""
    import ray

    flush_rows = _load_meta(root)["flush_rows"]
    forgotten = load_forgotten(root)
    live = live_files(root)

    def base_path(c: int, files: list[str]) -> str:
        top = max(_file_epoch(root, f) for f in files)
        return os.path.join(
            root, f"epoch={top:09d}", f"cl={c:05d}", "base.parquet"
        )

    @ray.remote
    def fold(files: list[str], base: str) -> int:
        t = pa.concat_tables([pq.read_table(f) for f in files]).sort_by(
            [("vec_id", "ascending")]
        )
        if len(forgotten):
            m = ~np.isin(t["vec_id"].to_numpy(), forgotten)
            if not m.all():
                t = t.filter(pa.array(m))
        atomic_write(
            base, lambda tmp: pq.write_table(t, tmp, row_group_size=flush_rows)
        )
        return t.num_rows

    targets = {
        c: files
        for c, files in live.items()
        if len(files) > max(over, 1)
        or (force and files and (clusters is None or c in clusters))
    }
    # ONE source of truth for each target's output path, shared by the
    # fold task and the deletion commit step below.
    bases = {c: base_path(c, files) for c, files in targets.items()}
    out = {
        c: ray.get(fu)
        for c, fu in {
            c: fold.remote(files, bases[c]) for c, files in targets.items()
        }.items()
    }
    # Deletion is the driver's commit step, AFTER every base landed: a
    # crash anywhere before/through here only leaves superseded files,
    # which the read rule already ignores. A force-fold of a single
    # base rewrites IN PLACE (same top epoch), so its own output path
    # is skipped.
    for c, files in targets.items():
        for f in files:
            if f == bases[c]:
                continue
            try:
                os.remove(f)
            except FileNotFoundError:
                pass
    # hygiene: drop superseded stragglers a crashed sweep left behind.
    # Liveness is RECOMPUTED here — the folds above just wrote new base
    # files that the pre-fold snapshot doesn't contain. Files of an
    # UNCOMMITTED epoch are in-flight, not stragglers — left alone —
    # UNLESS the epoch sits at or below the fold point: such an epoch
    # can never commit (update refuses it), so its files are
    # unreachable garbage and reclaiming them is the only exit.
    live_set = {f for files in live_files(root).values() for f in files}
    fp = _fold_point(root)
    for f in glob.glob(os.path.join(root, "epoch=*", "cl=*", "*.parquet")):
        if f in live_set:
            continue
        e = _file_epoch(root, f)
        if epoch_done(root, e) or e <= fp:
            try:
                os.remove(f)
            except FileNotFoundError:
                pass
    return out


def gate_semindex(
    root: str,
    sf_dir: str,
    rem: int,
    threshold: float = 0.38,
) -> pd.DataFrame:
    """Semantic ingest gate against the PERSISTED index: assign the
    epoch's delta vectors with the frozen centroids, probe each ONLY
    against its assigned cluster's live chain — one bounded tile per
    (incoming shard, index row group), point-reading exactly one row
    group per task (dedup._fetch_shard), the dupindex band-bucket
    point-read discipline applied to IVF cells. Verdict frame is
    identical to cluster.semantic_gate: one row per incoming vector,
    (vec_id, cluster, n_matches, canon, admit) — assembled by the
    SHARED probe/verdict kernel (cluster._probe_verdicts), so the two
    gates cannot drift. Probe cost is O(delta × cluster-chain), never
    O(delta × corpus); nothing is retrained and the corpus is never
    rescanned."""
    from lakecdc.cluster import _probe_verdicts, _route_cluster_shards

    meta = _load_meta(root)
    mod, flush_rows = meta["mod"], meta["flush_rows"]
    C = _load_centroids(root)

    # Route the delta into bounded in-memory shards (one streaming
    # pass, driver peak O(k x flush_rows)); collect its (vec_id,
    # cluster) assignments for the verdict frame.
    cells, assigns = _route_cluster_shards(
        sf_dir, C, flush_rows, {"in": (mod, rem, True)}, collect=("in",)
    )
    in_cells = cells["in"]
    in_ids, in_clusters = assigns["in"]
    ex_cells = _live_row_group_cells(root)
    return _probe_verdicts(in_cells, ex_cells, in_ids, in_clusters, threshold)


def search_semindex(
    root: str,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
) -> pd.DataFrame:
    """ANN cosine top-k served FROM the persisted index (IVF
    nprobe=1): each query (vec_id < n_queries — a small external probe
    set, read driver-side like contamination_check's probe side) is
    assigned to its nearest frozen centroid and scanned ONLY against
    that cluster's live chain, one bounded tile per (query shard,
    index row group). Each tile emits its local top-k per query
    (output-scale); the driver merges by (sim DESC, neighbor_id ASC)
    — ann_topk's exact tie discipline — and emits (query_id,
    neighbor_id, cos_e6). Self-matches are excluded. The IVF trade:
    recall bounded by cluster assignment, cost O(queries x
    cluster-chain) instead of O(queries x corpus)."""
    from lakecdc.cluster import _assign, _quantize
    from lakecdc.dedup import run_shard_tiles

    import ray

    meta = _load_meta(root)
    d, flush_rows = meta["d"], meta["flush_rows"]
    C = _load_centroids(root)

    # probe set only: predicate pushdown keeps the driver read
    # O(n_queries), never the corpus (contamination_check's probe-side
    # discipline)
    t = pq.read_table(
        table_path(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    qids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(qids):
        a = _assign(_quantize(t["embedding"]), C)
        emb = t["embedding"].combine_chunks()
        V = (
            emb.values.to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(qids), d)
        )
        Qn = V / np.maximum(np.linalg.norm(V, axis=1), 1e-30)[:, None]
    else:
        a = np.empty(0, np.int64)
        Qn = np.empty((0, d), np.float64)

    q_cells: dict[int, list] = {}
    for c in np.unique(a):
        m = a == c
        ci, cv = qids[m], Qn[m]
        for pos in range(0, len(ci), flush_rows):
            q_cells.setdefault(int(c), []).append(
                ray.put((ci[pos : pos + flush_rows], cv[pos : pos + flush_rows]))
            )

    ex_cells = _live_row_group_cells(root)

    _EMPTY = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "s": pa.array([], type=pa.float64()),
        }
    )

    def search_tile(idq, Vq, idx, Vx, _diagonal):
        sims = Vq @ Vx.T  # bounded: <= flush_rows^2
        out_q, out_n, out_s = [], [], []
        for qi in range(len(idq)):
            s = sims[qi]
            cand = np.nonzero(idx != idq[qi])[0]  # exclude self
            if not len(cand):
                continue
            # local top-k by (sim desc, neighbor asc): lexsort,
            # primary key last
            order = cand[np.lexsort((idx[cand], -s[cand]))[:k]]
            out_q.extend([int(idq[qi])] * len(order))
            out_n.extend(idx[order].tolist())
            out_s.extend(s[order].tolist())
        if not out_q:
            return None
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "s": pa.array(out_s, type=pa.float64()),
            }
        )

    hits = run_shard_tiles(q_cells, ex_cells, _EMPTY, search_tile)
    if len(hits):
        out = (
            hits.sort_values(
                ["query_id", "s", "neighbor_id"],
                ascending=[True, False, True],
                kind="stable",
            )
            .groupby("query_id", sort=False)
            .head(k)
        )
        out = out.assign(
            cos_e6=np.floor(out["s"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        )[["query_id", "neighbor_id", "cos_e6"]]
    else:
        out = pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cos_e6": []}
        )
    return (
        out.sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
        .astype(
            {"query_id": "int64", "neighbor_id": "int64", "cos_e6": "int64"}
        )
    )


def semindex_search_lifecycle(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    kc: int = 8,
    iters: int = 5,
    mod: int = 4,
    flush_rows: int = 64,
    compact_over: int = 2,
) -> pd.DataFrame:
    """Registry entry: build on epochs {0,1}, ingest epoch 2
    incrementally (trips auto-compaction), then serve ANN top-k from
    the persisted cells. The oracle (registry._semindex_search_sql)
    replays frozen-centroid training + existing-side assignment +
    within-cluster top-k from scratch."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="semindex-s-", dir="/tmp")
    try:
        build_semindex(
            root, sf_dir, k=kc, iters=iters, mod=mod, train_rems=(0, 1),
            flush_rows=flush_rows, compact_over=compact_over,
        )
        update_semindex(root, sf_dir, 2)
        return search_semindex(root, sf_dir, n_queries=n_queries, k=k)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def semindex_forget_gate_lifecycle(
    sf_dir: str,
    threshold: float = 0.38,
    k: int = 8,
    iters: int = 5,
    mod: int = 4,
    flush_rows: int = 64,
    compact_over: int = 2,
    forget_below: int = 16,
) -> pd.DataFrame:
    """Registry entry for the RTBF path: build {0,1}, ingest epoch 2,
    FORGET every index vector with vec_id < forget_below (fence +
    vacuum-fold + byte-level erasure audit), then gate epoch 3 — the
    verdicts must behave as if the forgotten vectors were never
    ingested. The oracle (_semindex_gate_sql with forget_below)
    excludes them from the existing side, so a hash match certifies
    the fence, the physical erasure AND the post-forget probe."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="semindex-f-", dir="/tmp")
    try:
        build_semindex(
            root, sf_dir, k=k, iters=iters, mod=mod, train_rems=(0, 1),
            flush_rows=flush_rows, compact_over=compact_over,
        )
        update_semindex(root, sf_dir, 2)
        victims = range(forget_below)
        forget_semindex(root, victims, vacuum=True)
        assert_forgotten_semindex(root, victims)
        return gate_semindex(root, sf_dir, 3, threshold=threshold)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def semindex_gate_lifecycle(
    sf_dir: str,
    threshold: float = 0.38,
    k: int = 8,
    iters: int = 5,
    mod: int = 4,
    flush_rows: int = 64,
    compact_over: int = 2,
) -> pd.DataFrame:
    """The driver-checked lifecycle: build the index on epochs {0, 1}
    (train + ingest), ingest epoch 2 incrementally (which trips the
    auto-compaction policy at compact_over=2, so the gate below reads
    a folded base chain through bounded row-group tiles), then gate
    epoch 3 against the persisted index. The oracle
    (registry._semindex_gate_sql) replays the frozen-centroid
    training, the existing-side assignment and the within-cluster
    cosine probe from scratch — so the hash check pins the WHOLE
    build/update/compact/gate lifecycle, not just the final probe."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="semindex-", dir="/tmp")
    try:
        build_semindex(
            root,
            sf_dir,
            k=k,
            iters=iters,
            mod=mod,
            train_rems=(0, 1),
            flush_rows=flush_rows,
            compact_over=compact_over,
        )
        update_semindex(root, sf_dir, 2)
        return gate_semindex(root, sf_dir, 3, threshold=threshold)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def semindex_gate_replay(
    sf_dir: str,
    threshold: float = 0.38,
    k: int = 8,
    iters: int = 5,
    mod: int = 4,
    train_rems: tuple[int, ...] = (0, 1),
    ex_rems: tuple[int, ...] = (0, 1, 2),
    rem: int = 3,
    forget_ids: tuple[int, ...] = (),
) -> pd.DataFrame:
    """Single-process ground truth for the full index lifecycle:
    centroids trained on ``train_rems`` only, existing side =
    ``ex_rems`` assigned with the FROZEN final centroids, incoming =
    ``rem`` brute-force-probed within its assigned cluster. Must match
    gate_semindex EXACTLY for any build/update sequence that ingested
    ``ex_rems`` (incremental == from-scratch, pre == post compaction).
    Delegates to cluster._gate_replay — ONE ground-truth
    implementation shared with semantic_gate_replay."""
    from lakecdc.cluster import _gate_replay

    return _gate_replay(
        sf_dir, threshold, k, iters,
        train_side=(mod, tuple(train_rems), True),
        ex_side=(mod, tuple(ex_rems), True),
        in_side=(mod, rem, True),
        ex_exclude=tuple(forget_ids),
    )
