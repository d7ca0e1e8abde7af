"""WAL segment reader.

Reference analogue: the chunked streaming reader of the fact files
(``pd.read_csv(..., chunksize=2_000_000)``,
scripts/superpac_ie_support.py:74-78) — here Ray Data's streaming
executor reads Parquet row-groups as blocks and pipelines them; no
manual chunk loop, and the 2M-row knob becomes block/batch size.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

from lakecdc.config import EngineConfig


def epoch_dir(cfg: EngineConfig, epoch: int) -> str:
    return os.path.join(cfg.wal_dir, f"epoch={epoch:09d}")


def list_epochs(cfg: EngineConfig) -> list[int]:
    return sorted(
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(os.path.join(cfg.wal_dir, "epoch=*"))
    )


def read_segment(cfg: EngineConfig, epoch: int) -> rd.Dataset:
    """One epoch's events as a lazy Dataset. Epochs are read one at a
    time so each apply sees a single WAL schema version (evolution
    happens at epoch boundaries; cross-version unification happens on
    the LAKE read path, lakecdc.lake)."""
    d = epoch_dir(cfg, epoch)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no WAL segment for epoch {epoch}: {d}")
    return rd.read_parquet(d)
