"""Lake read path.

The current lake = for each partition, the files of its latest
committed manifest record. Files may be at different schema-evolution
stages (pre-evolution partitions lack `source`); the read unifies them
by null-backfill — the ``_safe_read_csv`` analogue
(scripts/merge_support.py:17-36) done by pyarrow's dataset schema
projection, not per-row Python.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from lakecdc import manifest
from lakecdc.config import EngineConfig
from lakecdc.evolve import unify_concat
from lakecdc.schemas import LAKE_FILE_SCHEMA, LAKE_SCHEMA


def lake_files(cfg: EngineConfig, up_to_epoch: int | None = None) -> list[str]:
    snap = manifest.snapshot(cfg, up_to_epoch)
    return [f for rec in snap.values() for f in rec["files"]]


def read_lake(
    cfg: EngineConfig,
    up_to_epoch: int | None = None,
    include_meta: bool = False,
) -> rd.Dataset:
    """The live lake as a lazy Dataset (tombstones filtered, metadata
    columns dropped unless ``include_meta``). ``up_to_epoch`` gives
    time travel to any past committed epoch."""
    files = lake_files(cfg, up_to_epoch)
    if not files:
        return rd.from_arrow(
            LAKE_FILE_SCHEMA.empty_table() if include_meta else LAKE_SCHEMA.empty_table()
        )
    ds = rd.read_parquet(files, schema=LAKE_FILE_SCHEMA)

    def live(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.invert(batch["_deleted"]))
        if not include_meta:
            batch = batch.select([f.name for f in LAKE_SCHEMA])
        return batch

    return ds.map_batches(live, batch_format="pyarrow", zero_copy_batch=True)


def read_lake_local(
    cfg: EngineConfig, up_to_epoch: int | None = None
) -> pd.DataFrame:
    """Driver-side read for TESTS and small checks only (materializes).
    The production path is ``read_lake`` (streaming)."""
    files = lake_files(cfg, up_to_epoch)
    if not files:
        return LAKE_SCHEMA.empty_table().to_pandas()
    table = unify_concat([pq.read_table(f) for f in files], LAKE_FILE_SCHEMA)
    table = table.filter(pc.invert(table["_deleted"]))
    table = table.select([f.name for f in LAKE_SCHEMA])
    df = table.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)
