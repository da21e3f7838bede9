"""Metric anomaly detection — beyond the reference.

The reference charts metrics but ships no alerting primitive; "tell
me when this series spikes" is the operational companion to every
dashboard. Built as a composable series operator: input is any
(bucket, value) frame — a segmentation output, a rollup read, a
funnel step count — and the operator flags buckets whose value sits
more than ``z_threshold`` sample standard deviations from the
TRAILING window's mean (the current bucket is excluded from its own
baseline, so a spike cannot mask itself).

Determinism: the baseline is computed from window SUM and SUM OF
SQUARES — for integer-valued series those are exact integers, so
mean/variance/z are single double expressions mirrored verbatim in
the oracle, not an engine-specific streaming stddev (Welford order
would differ bitwise). The trailing frame is a RANGE over a day
index, so calendar gaps shrink the baseline instead of silently
sliding it (same reasoning as operators/windows.py rolling).

Scale note: this operator runs over a metric SERIES (one row per
bucket — thousands of rows after aggregation), not over raw events;
the single-partition ordered window is inherent to "trailing N
buckets" and is irrelevant at series size. The heavy lifting
(events → series) happens upstream in partial-aggregated
segmentation.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: day-index origin; any fixed date works, mirrored in the oracle
_EPOCH = "1970-01-01"


def anomaly_flags(
    series: DataFrame,
    value_col: str,
    bucket_col: str = "bucket",
    window: int = 7,
    z_threshold: float = 3.0,
    min_periods: int = 3,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Append (baseline_mean, z_score, is_anomaly) to a daily series.

    ``z_score`` is NULL while the trailing window holds fewer than
    ``min_periods`` buckets or has zero variance (a flat baseline
    has no scale — a deviation from it is a level CHANGE, not a
    z-scored spike; callers wanting that add an equality check).
    ``by``: dimension columns — each group gets its own independent
    trailing baseline, and the window partitions by them (the
    many-series frame stays distributed instead of single-partition).
    """
    idx = F.datediff(F.col(bucket_col), F.lit(_EPOCH))
    w = (
        Window.partitionBy(*[F.col(c) for c in by]) if by else Window
    ).orderBy(idx).rangeBetween(-window, -1)
    v = F.col(value_col)
    k = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    mean = s / k
    var = (ss - s * s / k) / (k - 1)
    z = (v - mean) / F.sqrt(var)
    ok = (k >= min_periods) & (var > 0)
    return series.select(
        "*",
        F.when(ok, mean).alias("baseline_mean"),
        F.when(ok, z).alias("z_score"),
        F.coalesce(ok & (F.abs(z) > z_threshold), F.lit(False))
        .alias("is_anomaly"),
    )
