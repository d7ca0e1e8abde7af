"""Additive schema evolution: unify Arrow tables to a target schema.

Reference analogue: ``_safe_read_csv`` (scripts/merge_support.py:17-36)
— a missing input becomes an empty frame, a missing column is
synthesized with a default — and the post-join backfill at
merge_support.py:271-274. Here evolution is additive-only: a table may
lack trailing columns of the target schema (e.g. pre-evolution WAL
segments / lake partitions without `source`), never conflict on type.
"""

from __future__ import annotations

import pyarrow as pa


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``table`` onto ``schema``: missing columns are added as
    all-null, column order is normalized, types are cast where the cast
    is lossless (e.g. int64 -> int64, large_string -> string).

    Extra columns not in ``schema`` are dropped (the projection F7
    analogue).
    """
    n = table.num_rows
    arrays = []
    for field in schema:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(n, type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def unify_concat(tables: list[pa.Table], schema: pa.Schema) -> pa.Table:
    """Concat tables that may be at different evolution stages, all
    conformed (null-backfilled) to ``schema``."""
    parts = [conform(t, schema) for t in tables if t is not None and t.num_rows > 0]
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts)
