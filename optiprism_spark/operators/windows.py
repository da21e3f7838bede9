"""Window analyses — rolling average, cumulative, period-over-period.

The reference DSL declares Analysis::{RollingAverage, Cumulative} and
Compare{offset, unit} (common/src/event_segmentation.rs:24-42) but no
engine code implements them (SURVEY §2.7). Spark window functions
cover all three natively.

Scale: the window partitions by the series keys (breakdowns) and
orders by the bucket — cardinality is chart-sized (≤ top-50 series ×
buckets), so these run on the tiny aggregated frame, never the raw
stream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-length interval units in seconds; month/year are calendar
#: units indexed separately in _bucket_index
_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600,
                 "day": 86400, "week": 604800}


def _bucket_index(bucket_col: str, interval: str):
    """Integer index with consecutive buckets exactly 1 apart — the
    RANGE-window axis that makes sparse series correct: a bucket with
    no row is a HOLE in the index, so a trailing-N window or an
    offset-N lookback skips it instead of silently stretching to the
    Nth *present* row (which could span weeks on a gappy series)."""
    if interval in _UNIT_SECONDS:
        return (F.unix_timestamp(F.col(bucket_col).cast("timestamp"))
                / F.lit(_UNIT_SECONDS[interval])).cast("long")
    if interval == "month":
        return (F.year(bucket_col) * 12 + F.month(bucket_col)).cast("long")
    if interval == "year":
        return F.year(bucket_col).cast("long")
    raise ValueError(f"unknown interval {interval!r}")


def offset_in_buckets(offset: int, unit: str, interval: str) -> int:
    """Convert a Compare offset expressed in ``unit`` into bucket
    steps of ``interval`` (e.g. 1 week over day buckets = 7)."""
    if unit == interval:
        return offset
    if unit in _UNIT_SECONDS and interval in _UNIT_SECONDS:
        q, r = divmod(_UNIT_SECONDS[unit], _UNIT_SECONDS[interval])
        if r or q == 0:
            raise ValueError(
                f"compare unit {unit!r} is not a whole number of"
                f" {interval!r} buckets")
        return offset * q
    if unit == "year" and interval == "month":
        return offset * 12
    raise ValueError(
        f"compare unit {unit!r} not convertible to interval {interval!r}")


def rolling_average(
    df: DataFrame, value_cols: Sequence[str], bucket_col: str = "bucket",
    partition_cols: Sequence[str] = (), window: int = 7,
    interval: str = "day",
) -> DataFrame:
    """Trailing n-bucket mean of each metric column. RANGE over the
    bucket index, not ROWS: zero-event buckets have no row in the
    aggregated frame, and a ROWS frame would average the last n
    PRESENT buckets (arbitrarily far back) instead of the last n
    calendar buckets."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(_bucket_index(bucket_col, interval))
        .rangeBetween(-(window - 1), 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.avg(F.col(c)).over(w))
    return out


def cumulative(
    df: DataFrame, value_cols: Sequence[str], bucket_col: str = "bucket",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Running sum of each metric column."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.sum(F.col(c)).over(w))
    return out


def logarithmic(df: DataFrame, value_cols: Sequence[str]) -> DataFrame:
    """log10 display transform of each metric column (reference
    Analysis::Logarithmic — declared, engine-unimplemented there);
    zero/negative values map to null, matching SQL log semantics."""
    out = df
    for c in value_cols:
        out = out.withColumn(
            c, F.when(F.col(c) > 0, F.log10(F.col(c).cast("double")))
        )
    return out


def compare_previous(
    df: DataFrame, value_cols: Sequence[str], offset: int,
    bucket_col: str = "bucket", partition_cols: Sequence[str] = (),
    unit: str = None, interval: str = "day",
) -> DataFrame:
    """Period-over-period: adds <col>_prev (the value `offset`
    ``unit``s earlier — defaults to interval buckets) and
    <col>_change_pct per metric column (reference Compare{offset,
    unit}). The lookback is a VALUE-based single-point RANGE frame on
    the bucket index, not LAG: positional lag would compare against
    the offset-th PRESENT row, which is the wrong period whenever the
    series has a zero-event gap — and would silently ignore a compare
    unit coarser than the interval (1 week over day buckets must reach
    7 buckets back, not 1 row)."""
    lag_n = offset_in_buckets(offset, unit or interval, interval)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(_bucket_index(bucket_col, interval))
        .rangeBetween(-lag_n, -lag_n)
    )
    out = df
    for c in value_cols:
        prev = F.max(F.col(c)).over(w)
        out = out.withColumn(f"{c}_prev", prev)
        out = out.withColumn(
            f"{c}_change_pct",
            F.when(
                prev.isNotNull() & (prev != 0),
                (F.col(c) - prev).cast("double") / prev.cast("double") * 100,
            ),
        )
    return out
