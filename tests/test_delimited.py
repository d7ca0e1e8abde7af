"""Delimited-text source (reference S1/S2): pipe-delimited headerless
read with fixed positional schema, permissive parse, counted drops."""

from __future__ import annotations

import os

from lakecdc.delimited import drop_and_count_invalid, read_delimited

COLS = ["id", "name", "amt"]


def _write_fixture(path: str) -> None:
    with open(path, "w") as f:
        f.write("C001|candA|100.5\n")
        f.write("C002|candB|notanumber\n")  # value-invalid: counted
        f.write("C003|only-two-fields\n")  # wrong arity: parser skip
        f.write("C004|candD|7\n")
        f.write("C005|candE|1|extra|fields\n")  # wrong arity: parser skip
        f.write("C006||0.25\n")  # empty name is fine (string col)


def test_permissive_parse_counts_drops(tmp_root):
    path = os.path.join(tmp_root, "dim.txt")
    _write_fixture(path)
    ds = read_delimited(path, COLS, numeric_columns=["amt"])
    good, n_bad = drop_and_count_invalid(ds)
    df = good.to_pandas().sort_values("id").reset_index(drop=True)
    # 6 lines: 2 dropped by the parser (arity), 1 counted invalid (coercion)
    assert n_bad == 1
    assert df["id"].tolist() == ["C001", "C004", "C006"]
    # everything ingests as string (reference dtype=str); coercion is lazy
    assert all(df[c].dtype == object for c in COLS)


def test_multi_file_union(tmp_root):
    p1 = os.path.join(tmp_root, "a.txt")
    p2 = os.path.join(tmp_root, "b.txt")
    with open(p1, "w") as f:
        f.write("A1|x|1\n")
    with open(p2, "w") as f:
        f.write("B1|y|2\nB2|z|bad\n")
    ds = read_delimited([p1, p2], COLS, numeric_columns=["amt"])
    good, n_bad = drop_and_count_invalid(ds)
    assert n_bad == 1
    assert sorted(good.to_pandas()["id"]) == ["A1", "B1"]
