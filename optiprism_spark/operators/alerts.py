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
    # by=(): a single series is inherently one ordered partition and
    # WindowExec warns about it. That is correct and acceptable HERE
    # ONLY because the input is a post-aggregation series (one row
    # per bucket — years of daily data is thousands of rows); Spark
    # 4's EliminateWindowPartitions folds away a constant key, so the
    # warning cannot be silenced without changing semantics. Callers
    # with many series pass by= and the window stays distributed.
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


def robust_anomaly_flags(
    series: DataFrame,
    value_col: str,
    threshold: float = 3.5,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Append (baseline_median, robust_z, is_anomaly) via the Hampel
    estimator: robust_z = (v − median) / (1.4826·MAD), flagged at
    |robust_z| > ``threshold`` (3.5 is Hampel's classic cut).

    The companion to `anomaly_flags`: a mean/std baseline is itself
    poisoned by the outliers it is looking for (one 100× spike in the
    trailing window inflates σ enough to hide the next one), while
    median/MAD have a 50% breakdown point — the right detector for a
    WHOLE-series batch sweep (backfills, snapshot audits). The
    trailing z variant stays the right shape for streaming ticks.

    ``robust_z`` is NULL when MAD == 0 (a majority-flat series has no
    robust scale — a deviation from it is a level change, same
    contract as `anomaly_flags`); it is rounded to 9 decimals, and
    the median comes from Spark's exact interpolated ``percentile``,
    which DuckDB's ``median`` reproduces bit-for-bit — both oracle
    requirements.

    Scale shape: the input is a metric SERIES (one row per bucket ×
    group — tiny, post-aggregation), so the two median passes cost
    nothing; each reduces per group (map-side combinable) and joins
    back broadcast. ``by=`` gives every group its own independent
    median/MAD. No crossJoin, no driver round-trip.

    NULL group values are a group like any other: groupBy keeps them,
    and the join-back is null-safe (``eqNullSafe``), so a nullable
    dim keeps its own baseline — same row coverage as the window-based
    `anomaly_flags` (a plain equi-join would silently drop those rows).
    """
    from ._util import track_persist

    # the series frame feeds FOUR consumers (the median aggregate,
    # its join-back, the MAD aggregate over that, and the final
    # select) — unpersisted, each re-derives the whole upstream
    # events→series aggregation, so the plan ran the scan chain 4x
    # (plans/r16/alert_robust_value_daily_by_type_before.txt). The
    # series is post-aggregation tiny (one row per bucket × group),
    # so persisting it is the textbook reuse case (guide §5).
    series = track_persist(series)
    v = F.col(value_col)
    med_of = lambda c: F.expr(f"percentile({c}, 0.5)")  # noqa: E731

    def _nsjoin(left: DataFrame, right: DataFrame,
                keys: list[str]) -> DataFrame:
        # null-safe broadcast join-back: rename the right-side keys so
        # the condition is unambiguous, then drop them
        import functools
        import operator

        right = right.select(
            *[F.col(k).alias(f"__g_{k}") for k in keys],
            *[c for c in right.columns if c not in keys])
        cond = functools.reduce(operator.and_, [
            F.col(k).eqNullSafe(F.col(f"__g_{k}")) for k in keys])
        return left.join(F.broadcast(right), cond).drop(
            *[f"__g_{k}" for k in keys])

    if by:
        keys = list(by)
        med = series.groupBy(*keys).agg(
            med_of(value_col).alias("__med"))
        with_med = _nsjoin(series, med, keys)
        mad = (
            with_med.select(*keys, F.abs(v - F.col("__med")).alias("__d"))
            .groupBy(*keys).agg(med_of("__d").alias("__mad"))
        )
        joined = _nsjoin(with_med, mad, keys)
    else:
        med = series.agg(med_of(value_col).alias("__med")).withColumn(
            "__k", F.lit(1))
        with_med = series.withColumn("__k", F.lit(1)).join(
            F.broadcast(med), "__k")
        mad = (
            with_med.select(F.abs(v - F.col("__med")).alias("__d"))
            .agg(med_of("__d").alias("__mad")).withColumn("__k", F.lit(1))
        )
        joined = with_med.join(F.broadcast(mad), "__k").drop("__k")
    z = F.round((v - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")), 9)
    ok = F.col("__mad") > 0
    return joined.select(
        *series.columns,
        F.col("__med").alias("baseline_median"),
        F.when(ok, z).alias("robust_z"),
        F.coalesce(ok & (F.abs(z) > F.lit(threshold)), F.lit(False))
        .alias("is_anomaly"),
    )


def daily_count_series(
    events: DataFrame,
    time,
    dim: "str | None" = None,
    event=None,
    filters=(),
) -> DataFrame:
    """Raw-scan twin of `rollup.count_series_from_rollup`: daily event
    counts ``([dim,] bucket, n)`` — one partial-aggregated scan. The
    exact fallback when no declared rollup can serve the series."""
    from ..exprs import full_filter

    cond = full_filter(time, event, filters)
    df = events.filter(cond) if cond is not None else events
    keys = ([F.col(dim)] if dim else []) + [
        F.date_trunc("day", F.col("ts")).cast("date").alias("bucket")]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
