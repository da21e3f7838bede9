"""Shared oracle-SQL fragments.

The oracle runs in DuckDB on the same parquet. Numeric SUM/AVG go
through DECIMAL(28,16) on BOTH sides (see operators/aggregates.py
DECIMAL_T): exact fixed-point arithmetic makes the result independent
of partitioning/summation order, so Spark and DuckDB hash-match
bit-for-bit.
"""

from __future__ import annotations

_DATE_UNITS = ("day", "week", "month", "year")


def bucket(unit: str, ts: str = "ts") -> str:
    e = f"date_trunc('{unit}', {ts})"
    return f"CAST({e} AS DATE)" if unit in _DATE_UNITS else e


#: keep in sync with operators/aggregates.DECIMAL_T (scale rationale there)
DECIMAL_T = "DECIMAL(28,6)"


def sum_exact(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS {DECIMAL_T})) AS DOUBLE)"


def avg_exact(col: str) -> str:
    return f"(CAST(SUM(CAST({col} AS {DECIMAL_T})) AS DOUBLE) / COUNT({col}))"


# deterministic fixed time ranges over the Jan-2024 events data
T_FULL = ("2024-01-01 00:00:00", "2024-01-31 23:59:59")
T_MID = ("2024-01-05 00:00:00", "2024-01-20 23:59:59")


def ts_between(lo: str, hi: str, ts: str = "ts") -> str:
    return f"{ts} >= TIMESTAMP '{lo}' AND {ts} <= TIMESTAMP '{hi}'"
