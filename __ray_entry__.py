"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline (synthetic WAL -> lake
upsert engine) at sf0.001. ``queries()`` exposes every implemented
operator/pipeline from SURVEY.md §2 plus the training-data-pipeline
operators; ``oracle_sql()`` gives the DuckDB equivalent for the
SQL-expressible ones (rows-only checks otherwise).

Ray is initialised by the driver BEFORE this module is imported:
nothing here (or in lakecdc) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from lakecdc.flagship import run_flagship
from lakecdc.registry import DRIVER_QUERIES, ORACLES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: deterministic
    synthetic WAL scaled to the sf dir -> full CDC apply (validate,
    LWW merge, manifest, lineage) -> final lake state."""
    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """Curated 50-entry view (the driver records at most ~50 rows per
    round; see lakecdc.registry.DRIVER_QUERIES — every excluded entry
    is either a documented redundant twin of a kept one or a new-this-
    round rotation candidate, and stays pytest-checked against DuckDB
    via the FULL registry in tests/test_queries_vs_duckdb.py)."""
    return dict(DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in ORACLES.items() if k in DRIVER_QUERIES}
