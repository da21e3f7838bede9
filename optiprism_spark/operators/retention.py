"""Retention / cohort analysis — beyond the reference.

The reference ships funnels and behavioral segments but no retention
operator (no retention types anywhere in common/src or query/src);
it is the third leg of every product-analytics stool, so it is built
here Spark-first:

- cohort assignment: each user's FIRST occurrence of the cohort event
  inside the query window, bucketed to the chart interval (the
  "signed up in week W" axis);
- return matrix: for each later period k, the distinct users of that
  cohort who did the return event in bucket W+k (classic N-period
  retention) — or in ANY bucket ≥ W+k for `unbounded` retention
  ("still active at or after day k", the churn-friendly reading);
- output long format: (cohort_bucket, period, cohort_size, retained,
  pct) — pivot to the triangle with reshape.pivot_buckets if a chart
  wants columns.

Plan shape (the 100 TB story): one groupBy per side — cohort firsts
are a (user → min bucket) partial-aggregated shuffle, the return side
reduces to DISTINCT (user, bucket) pairs BEFORE the join (events-scale
→ user×bucket-scale, orders of magnitude smaller), then an equi-join
on user co-partitioned with the groupBys, then one final (cohort,
period) count-distinct. No window functions, no per-row Python.
Unbounded retention reuses the same frame with a max-bucket per user
instead of expanding periods.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dsl import EventRef, PropFilter, QueryTime, TimeIntervalUnit
from ..exprs import full_filter
from ..operators.aggregates import bucket_col
from ..schema import EVENT_TIME_COL, EVENT_USER_COL

#: intervals supported as retention periods (sub-day cohorts are
#: rarely meaningful and make the period arithmetic ambiguous)
_PERIOD_UNITS = (
    TimeIntervalUnit.DAY,
    TimeIntervalUnit.WEEK,
    TimeIntervalUnit.MONTH,
)


def _period_expr(cohort_b: Column, return_b: Column, unit: TimeIntervalUnit) -> Column:
    """Whole periods between two already-truncated buckets."""
    if unit == TimeIntervalUnit.DAY:
        return F.datediff(return_b, cohort_b)
    if unit == TimeIntervalUnit.WEEK:
        return (F.datediff(return_b, cohort_b) / 7).cast("int")
    # MONTH: buckets are month starts, so months_between is integral
    return F.months_between(return_b, cohort_b).cast("int")


def _cohorts_and_sizes(
    events: DataFrame,
    cohort_event: EventRef,
    time: QueryTime,
    interval: TimeIntervalUnit,
    filters: Sequence[PropFilter],
    group_col: str,
) -> tuple[DataFrame, DataFrame]:
    """First-touch cohort assignment shared by retention and
    revenue_cohorts: (user → min cohort bucket) and the per-bucket
    cohort sizes — one semantics, one implementation."""
    b = bucket_col(interval)
    cohort_cond = full_filter(time, cohort_event, filters)
    # r16 (optimization round): examined and deliberately left
    # UN-materialized. The matrix tail consumes `cohorts` twice and
    # `sizes` twice, and the analyzed plan shows four cohort-side
    # scan chains — but at RUNTIME AQE's exchange reuse collapses
    # them to 3 scans (measured via the stage-metrics API), and both
    # persist shapes measured SLOWER locally (persist both: 0.81 s
    # min vs 0.65 s plain; sizes-only: 0.85 s — the InMemoryRelation
    # conversion barrier costs more than the 2 MB duplicate scans
    # save, and would trip the bench's 2x-best creep gate). At 100 TB
    # the duplicate cohort pass is real, but that deployment serves
    # retention from the (dt, user) store (retention_from_user_day),
    # whose cohort input is the day-partitioned partials, not a raw
    # event scan.
    cohorts = (
        (events.filter(cohort_cond) if cohort_cond is not None else events)
        .groupBy(group_col)
        .agg(F.min(b).alias("__cohort_b"))
    )
    sizes = cohorts.groupBy(F.col("__cohort_b").alias("cohort_bucket")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return cohorts, sizes


def retention(
    events: DataFrame,
    cohort_event: EventRef,
    return_event: EventRef,
    time: QueryTime,
    interval: TimeIntervalUnit = TimeIntervalUnit.WEEK,
    max_periods: int = 12,
    filters: Sequence[PropFilter] = (),
    group_col: str = EVENT_USER_COL,
    unbounded: bool = False,
) -> DataFrame:
    """Cohort retention matrix, long format.

    Returns (cohort_bucket, period, cohort_size, retained, pct) with
    period 0..max_periods; period 0 counts the cohort itself for the
    classic triangle. ``unbounded=True`` counts a user as retained at
    period k if they returned at ANY period ≥ k.
    """
    if interval not in _PERIOD_UNITS:
        raise ValueError(f"retention interval must be one of {_PERIOD_UNITS}")
    b = bucket_col(interval)
    cohorts, sizes = _cohorts_and_sizes(
        events, cohort_event, time, interval, filters, group_col)

    ret_cond = full_filter(time, return_event, filters)
    returns = (
        (events.filter(ret_cond) if ret_cond is not None else events)
        .select(group_col, b.alias("__return_b"))
        .distinct()
    )
    return retention_matrix(cohorts, returns, sizes, interval,
                            max_periods, unbounded, group_col)


def retention_matrix(
    cohorts: DataFrame,
    returns: DataFrame,
    sizes: DataFrame,
    interval: TimeIntervalUnit,
    max_periods: int,
    unbounded: bool,
    group_col: str = EVENT_USER_COL,
) -> DataFrame:
    """The matrix tail shared by the raw path above and the user-day
    rollup route (userday.retention_from_user_day): ``cohorts`` is
    (group_col, __cohort_b), ``returns`` the distinct (group_col,
    __return_b) pairs, ``sizes`` the per-bucket cohort sizes. One
    implementation — routed ≡ raw is an equality of these three
    frames, which fold identically from (dt, user) partials."""
    joined = cohorts.join(returns, group_col).withColumn(
        "__p", _period_expr(F.col("__cohort_b"), F.col("__return_b"), interval)
    ).filter((F.col("__p") >= 1) & (F.col("__p") <= max_periods))

    if unbounded:
        # retained at k ⇔ max return period ≥ k: one row per user with
        # their horizon, exploded to 1..horizon (bounded by
        # max_periods, so the explode is ≤ max_periods rows per user)
        horizons = joined.groupBy(group_col, "__cohort_b").agg(
            F.max("__p").alias("__h")
        )
        per_period = horizons.select(
            F.col("__cohort_b"),
            F.explode(F.sequence(F.lit(1), F.col("__h"))).alias("period"),
            F.col(group_col),
        )
        retained = per_period.groupBy(
            F.col("__cohort_b").alias("cohort_bucket"), "period"
        ).agg(F.count(F.lit(1)).alias("retained"))
        # horizons are per-user distinct already, so plain count
    else:
        retained = joined.groupBy(
            F.col("__cohort_b").alias("cohort_bucket"),
            F.col("__p").alias("period"),
        ).agg(F.count_distinct(F.col(group_col)).alias("retained"))

    zero = sizes.select(
        "cohort_bucket",
        F.lit(0).alias("period"),
        F.col("cohort_size").alias("retained"),
    )
    out = (
        zero.unionByName(retained)
        .join(F.broadcast(sizes), "cohort_bucket")
        .select(
            "cohort_bucket",
            "period",
            "cohort_size",
            "retained",
            (F.col("retained").cast("double") / F.col("cohort_size"))
            .alias("pct"),
        )
    )
    return out


def revenue_cohorts(
    events: DataFrame,
    cohort_event: EventRef,
    time: QueryTime,
    value_col: str = "value",
    interval: TimeIntervalUnit = TimeIntervalUnit.WEEK,
    max_periods: int = 12,
    filters: Sequence[PropFilter] = (),
    group_col: str = EVENT_USER_COL,
    revenue_event: Optional[EventRef] = None,
) -> DataFrame:
    """LTV-style cohort revenue: for each cohort (first cohort_event
    bucket) and period k, the exact-decimal sum of ``value_col`` over
    the cohort's events in bucket W+k, cumulative revenue, and
    per-member average (the LTV curve). Same two-sided shape as
    retention, but the return side pre-aggregates revenue to
    (user, bucket) grain before the join — never event-scale.
    """
    if interval not in _PERIOD_UNITS:
        raise ValueError(f"revenue_cohorts interval must be one of {_PERIOD_UNITS}")
    from .aggregates import DECIMAL_T

    b = bucket_col(interval)
    cohorts, sizes = _cohorts_and_sizes(
        events, cohort_event, time, interval, filters, group_col)
    rev_cond = full_filter(time, revenue_event, filters)
    rev = (
        (events.filter(rev_cond) if rev_cond is not None else events)
        .groupBy(group_col, b.alias("__return_b"))
        .agg(F.sum(F.col(value_col).cast(DECIMAL_T)).alias("__rev"))
    )
    per = (
        cohorts.join(rev, group_col)
        .withColumn("__p", _period_expr(F.col("__cohort_b"), F.col("__return_b"), interval))
        .filter((F.col("__p") >= 0) & (F.col("__p") <= max_periods))
        .groupBy(F.col("__cohort_b").alias("cohort_bucket"), F.col("__p").alias("period"))
        .agg(F.sum("__rev").alias("__rev_dec"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("cohort_bucket")
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # cumulate on the DECIMAL then cast: exact fixed-point keeps the
    # running sum engine- and order-independent (same trick as DECIMAL_T)
    return (
        per.withColumn("__cum_dec", F.sum("__rev_dec").over(w))
        .join(F.broadcast(sizes), "cohort_bucket")
        .select(
            "cohort_bucket",
            "period",
            "cohort_size",
            F.col("__rev_dec").cast("double").alias("revenue"),
            F.col("__cum_dec").cast("double").alias("cum_revenue"),
            (F.col("__cum_dec").cast("double") / F.col("cohort_size")).alias("ltv"),
        )
    )
