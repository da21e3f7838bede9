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


def rolling_average(
    df: DataFrame, value_cols: Sequence[str], bucket_col: str = "bucket",
    partition_cols: Sequence[str] = (), window: int = 7,
) -> DataFrame:
    """Trailing n-bucket mean of each metric column."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(bucket_col)
        .rowsBetween(-(window - 1), 0)
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
) -> DataFrame:
    """Period-over-period: adds <col>_prev (the value `offset` buckets
    earlier) and <col>_change_pct per metric column (reference
    Compare{offset, unit})."""
    w = Window.partitionBy(*partition_cols).orderBy(bucket_col)
    out = df
    for c in value_cols:
        prev = F.lag(F.col(c), offset).over(w)
        out = out.withColumn(f"{c}_prev", prev)
        out = out.withColumn(
            f"{c}_change_pct",
            F.when(
                prev.isNotNull() & (prev != 0),
                (F.col(c) - prev).cast("double") / prev.cast("double") * 100,
            ),
        )
    return out
