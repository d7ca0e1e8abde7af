"""Flagship pipeline: the full CDC engine run, parameterized by sf dir.

Synthesizes a deterministic WAL scaled to the sf directory's
`documents` table, applies every epoch through the engine
(validate -> compact -> shuffle -> LWW merge -> manifest -> lineage),
and returns the final lake state. Used by ``__ray_entry__.entry()``
(sf0.001 smoke) and registered as the rows-only query
``cdc_apply_tokens``.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from lakecdc import synth
from lakecdc.apply import apply_all
from lakecdc.config import EngineConfig
from lakecdc.lake import read_lake_local
from lakecdc.lineage import write_rollup
from lakecdc.qutil import table_path


def flagship_params(sf_dir: str) -> dict:
    n_docs_table = pq.ParquetFile(table_path(sf_dir, "documents")).metadata.num_rows
    n_docs = 4 * n_docs_table
    return {
        "n_docs": n_docs,
        "n_epochs": 4,
        "events_per_epoch": 5 * n_docs,
        "evolution_epoch": 2,
        "zipf_a": 1.3,
        "p_invalid": 0.01,
    }


def run_flagship(
    sf_dir: str, work_root: str | None = None, fresh: bool = True
) -> pd.DataFrame:
    """Returns the live lake as (doc_id, n_tok, source) after applying
    the full synthetic change stream. Deterministic for a given sf_dir."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = work_root or os.path.join("/tmp", f"lakecdc_flagship_{tag}")
    if fresh:
        shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(root=root, num_buckets=16)
    cfg.ensure_dirs()
    p = flagship_params(sf_dir)
    synth.write_wal(
        cfg.wal_dir,
        n_docs=p["n_docs"],
        n_epochs=p["n_epochs"],
        events_per_epoch=p["events_per_epoch"],
        seed=cfg.seed,
        evolution_epoch=p["evolution_epoch"],
        zipf_a=p["zipf_a"],
        p_invalid=p["p_invalid"],
    )
    apply_all(cfg)
    write_rollup(cfg)
    lake = read_lake_local(cfg)
    out = lake[["doc_id", "n_tok", "source"]].copy()
    out["n_tok"] = out["n_tok"].astype("int64")
    return out.reset_index(drop=True)
