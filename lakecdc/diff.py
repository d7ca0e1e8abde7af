"""Snapshot diff — CDC *output*: turn two committed lake epochs into a
net change stream (insert / update / delete events), the inverse
direction of the WAL-apply path.

Shape: PARTITION-ALIGNED, NO SHUFFLE. The bucket partitioning is
stable across epochs (same ``hash(doc_id) % num_buckets`` everywhere),
so the diff of partition *p* at epoch A vs epoch B needs only
partition *p*'s two file chains — one task per partition, each a
vectorized outer-join compare. At 100 TB this is the property that
makes downstream CDC fan-out (replication, cache invalidation,
incremental view feed) O(lake/partitions) per task with zero exchange.

Reference analogue: ``combine_csv.py`` is the reference's only
cross-run operator (union + provenance); the diff is its inverse —
deriving the change provenance BETWEEN runs instead of concatenating
them. The emitted events round-trip: applying the diff of (A -> B) to
snapshot A with the ordinary LWW rules reproduces snapshot B exactly
(tested against the replay oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from lakecdc import manifest
from lakecdc.config import EngineConfig
from lakecdc.lake import _merge_chain

# op is 'insert' | 'update' | 'delete'; delete rows carry the
# tombstone's LSN when it is still resident (null after a compaction
# dropped it) and null payload columns.
CHANGELOG_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("lsn", pa.int64()),
    ]
)


def _diff_partition(
    files_from: list[str], files_to: list[str], engine: str
) -> pa.Table:
    """Vectorized diff of one partition's two chains. ``from`` needs
    only live (doc_id, _lsn) — token bytes of the old snapshot are
    never read (column pruning); ``to`` is read with tombstones so
    deletes keep their LSN."""
    keep_tomb = engine == "lww"
    to_t = _merge_chain(
        files_to, include_meta=True, engine=engine, keep_tombstones=keep_tomb
    ).to_pandas()
    if files_from:
        from_t = _merge_chain(
            files_from, include_meta=True, engine=engine, columns=["doc_id"]
        ).to_pandas()[["doc_id", "_lsn"]]
    else:
        from_t = pd.DataFrame({"doc_id": pd.Series(dtype=object), "_lsn": pd.Series(dtype="int64")})
    if "_deleted" not in to_t.columns:  # partial engine live view
        to_t["_deleted"] = False
    m = to_t.merge(
        from_t, on="doc_id", how="outer", suffixes=("", "_from"), indicator=True
    )
    in_from = (m["_merge"] != "left_only").to_numpy()
    in_to = (m["_merge"] != "right_only").to_numpy()
    dead = m["_deleted"].fillna(True).to_numpy(dtype=bool)
    is_insert = in_to & ~dead & ~in_from
    is_update = in_to & ~dead & in_from & (m["_lsn"].to_numpy() != m["_lsn_from"].to_numpy())
    # live in FROM and (tombstoned in TO, or gone entirely post-compaction)
    is_delete = in_from & (~in_to | (in_to & dead))
    out = m[is_insert | is_update | is_delete].copy()
    op = np.where(
        (out["_merge"] != "left_only") & (out["_deleted"].fillna(True)),
        "delete",
        np.where((out["_merge"] == "left_only"), "insert", "update"),
    )
    deleted = op == "delete"
    lsn = out["_lsn"].to_numpy()
    tokens = out["tokens"] if "tokens" in out else pd.Series([None] * len(out))
    return pa.table(
        {
            "op": pa.array(op, type=pa.string()),
            "doc_id": pa.array(out["doc_id"], type=pa.string()),
            "tokens": pa.array(
                [None if d else t for d, t in zip(deleted, tokens)],
                type=pa.list_(pa.int32()),
            ),
            "n_tok": pa.array(
                [None if d else v for d, v in zip(deleted, out.get("n_tok", pd.Series([None] * len(out))))],
                type=pa.int32(),
            ),
            "source": pa.array(
                [None if d else s for d, s in zip(deleted, out.get("source", pd.Series([None] * len(out))))],
                type=pa.string(),
            ),
            "lsn": pa.array(
                [None if np.isnan(x) else int(x) for x in lsn], type=pa.int64()
            ),
        },
        schema=CHANGELOG_SCHEMA,
    )


def diff_snapshots(
    cfg: EngineConfig,
    from_epoch: int | None,
    to_epoch: int | None = None,
) -> rd.Dataset:
    """Net change stream turning committed snapshot ``from_epoch`` into
    ``to_epoch`` (None = empty lake / latest respectively), as a lazy
    Dataset with CHANGELOG_SCHEMA — one diff task per partition.

    Guarantees (tested): applying the emitted events onto snapshot
    ``from_epoch`` under LWW reproduces snapshot ``to_epoch`` per-row
    (token-array equality); ``diff(e, e)`` is empty; unchanged rows
    are never emitted (the stream is O(changed), not O(lake))."""
    view_to = manifest.partition_view(cfg, to_epoch)
    view_from = (
        {} if from_epoch is None else manifest.partition_view(cfg, from_epoch)
    )
    parts = sorted(set(view_to) | set(view_from))
    if not parts:
        return rd.from_arrow(CHANGELOG_SCHEMA.empty_table())
    items = [
        {"from": list(view_from.get(p, [])), "to": list(view_to.get(p, []))}
        for p in parts
    ]
    engine = cfg.merge_engine

    def task(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            if not row["to"] and not row["from"]:
                continue
            if not row["to"]:
                # partition vanished entirely (vacuumed empty): all deletes
                t = _merge_chain(row["from"], include_meta=True, engine=engine)
                tables.append(
                    pa.table(
                        {
                            "op": pa.array(["delete"] * t.num_rows),
                            "doc_id": t["doc_id"],
                            "tokens": pa.nulls(t.num_rows, pa.list_(pa.int32())),
                            "n_tok": pa.nulls(t.num_rows, pa.int32()),
                            "source": pa.nulls(t.num_rows, pa.string()),
                            "lsn": pa.nulls(t.num_rows, pa.int64()),
                        },
                        schema=CHANGELOG_SCHEMA,
                    )
                )
            else:
                tables.append(_diff_partition(row["from"], row["to"], engine))
        if not tables:
            return CHANGELOG_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return rd.from_items(items).map_batches(
        task, batch_size=1, batch_format="pyarrow"
    )


def collect_changelog(ds: rd.Dataset) -> pd.DataFrame:
    """Materialize a changelog Dataset driver-side (tests / small tails
    only — production consumers stream via write_parquet/iter_batches).
    Goes through Arrow because Ray's to_pandas() tries to tensor-cast
    the ragged `tokens` list column and fails on nulls."""
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    t = (
        pa.concat_tables(batches)
        if batches
        else CHANGELOG_SCHEMA.empty_table()
    )
    return t.to_pandas()
