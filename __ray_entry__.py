"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Implementations live in
``ballet_ray/pipelines/driver_queries.py``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code it calls) invokes ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → canonical
    token table → fitted feature matrix (SURVEY.md §3.1)."""
    from ballet_ray.pipelines.flagship import flagship_features

    return flagship_features("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from ballet_ray.pipelines.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query (omitted keys → rows-only check)."""
    from ballet_ray.pipelines.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
