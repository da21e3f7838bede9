"""Query registry: named (spark, sf_dir) -> DataFrame callables plus
their DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 registers here via the
``@query`` decorator; ``__spark_entry__`` re-exports the two dicts for
the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query; ``oracle=None`` => non-SQL-expressible op
    (driver records a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def suite_round_robin(queries: dict) -> dict:
    """Reorder queries round-robin across suites (modules): any prefix
    of the dict then covers every operator family. The driver's
    correctness gate checks a bounded number of entries in dict order —
    a suite-sequential order would leave whole families unchecked."""
    from itertools import zip_longest

    by_suite: dict[str, list[str]] = {}
    for name, fn in queries.items():
        by_suite.setdefault(getattr(fn, "__module__", ""), []).append(name)
    order = [
        n
        for row in zip_longest(*by_suite.values())
        for n in row
        if n is not None
    ]
    return {n: queries[n] for n in order}


# Suites self-register on import (order = SURVEY §2 section order).
# Extend this list as suites are added — no try/except, a broken suite
# module must fail loudly.
from .suites import (  # noqa: E402,F401
    dedup,
    funnel,
    ingest,
    multimodal,
    records,
    reshape,
    segmentation,
    segments,
    similarity,
    text,
    warehouse,
    windows,
)
