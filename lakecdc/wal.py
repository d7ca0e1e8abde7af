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


def read_changelog(
    cfg: EngineConfig,
    from_epoch: int | None = None,
    to_epoch: int | None = None,
    include_invalid: bool = False,
) -> rd.Dataset:
    """The consumer-facing change stream: every validated event in
    ``[from_epoch, to_epoch]`` as one schema-unified lazy Dataset
    (v0 segments null-backfilled), ordered by ``lsn`` WITHIN each
    block only — a CDC consumer that needs total order sorts or folds
    by key, same as the engine does. Invalid events are excluded by
    default but available (``include_invalid=True`` keeps them with
    the `_invalid` marker) — counted, never silently lost.

    This is the downstream half of the reference's chunked fact-file
    tail (scripts/superpac_ie_support.py:74-78): readers resume from a
    manifest watermark epoch and stream forward.
    """
    import pyarrow.compute as pc

    from lakecdc.evolve import conform
    from lakecdc.schemas import WAL_SCHEMA_V1

    if cfg.merge_engine == "partial":
        from lakecdc.partial import validation_mask_partial as _mask
    else:
        from lakecdc.apply import _validation_mask as _mask

    epochs = [
        e
        for e in list_epochs(cfg)
        if (from_epoch is None or e >= from_epoch)
        and (to_epoch is None or e <= to_epoch)
    ]
    files = [
        f
        for e in epochs
        for f in sorted(glob.glob(os.path.join(epoch_dir(cfg, e), "*.parquet")))
    ]
    schema = WAL_SCHEMA_V1
    if include_invalid:
        import pyarrow as pa

        schema = pa.schema(list(schema) + [("_invalid", pa.bool_())])
    if not files:
        return rd.from_arrow(schema.empty_table())
    ds = rd.read_parquet(files, schema=WAL_SCHEMA_V1)

    def prep(t):
        t = conform(t, WAL_SCHEMA_V1)
        mask = _mask(t)
        if include_invalid:
            return t.append_column(
                "_invalid", pc.invert(mask)
            ).sort_by("lsn")
        return t.filter(mask).sort_by("lsn")

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
