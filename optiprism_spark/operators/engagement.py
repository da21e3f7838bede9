"""Engagement analytics — stickiness and activity histograms.

Beyond the reference (its aggregate DSL covers DAU/WAU/MAU as chart
series but none of the derived engagement shapes): the two standard
product-health reads, both single-pass declarative aggregations.

- ``stickiness``: per period (week/month), mean daily active users ÷
  period active users — the DAU/WAU or DAU/MAU ratio trend. The mean
  runs over ALL calendar days of the period (7 for weeks, the
  month's length for months): zero-activity days count as zero, so a
  once-a-week product reads ~1/7, not 1.0. Edge periods clipped by
  the query window still divide by the full period length — the
  convention every DAU/MAU chart uses; re-bound the window to whole
  periods for exact edges. Shape: two groupBys over the same
  filtered scan (day grain then period grain), joined on the period
  key; both are map-side-combined count-distincts, the join sides
  are period-cardinality (tiny).
- ``active_days_histogram``: the L28-style curve — how many users
  were active on exactly k distinct days of the window. Shape: one
  (user → distinct-day-count) aggregate, then a count-by-k histogram;
  per-user state never leaves the executors unaggregated.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dsl import EventRef, PropFilter, QueryTime, TimeIntervalUnit
from ..exprs import full_filter
from ..operators.aggregates import bucket_col
from ..schema import EVENT_USER_COL


def stickiness(
    events: DataFrame,
    time: QueryTime,
    period: TimeIntervalUnit = TimeIntervalUnit.WEEK,
    event: Optional[EventRef] = None,
    filters: Sequence[PropFilter] = (),
    group_col: str = EVENT_USER_COL,
) -> DataFrame:
    """(bucket, avg_dau, period_active, stickiness) per period."""
    if period not in (TimeIntervalUnit.WEEK, TimeIntervalUnit.MONTH):
        raise ValueError("stickiness period must be week or month")
    cond = full_filter(time, event, filters)
    df = events.filter(cond) if cond is not None else events
    pb = bucket_col(period).alias("bucket")
    db = bucket_col(TimeIntervalUnit.DAY).alias("__day")
    days_in_period = (
        F.lit(7)
        if period == TimeIntervalUnit.WEEK
        else F.dayofmonth(F.last_day(F.col("bucket")))
    )
    daily = (
        df.groupBy(pb, db)
        .agg(F.count_distinct(F.col(group_col)).alias("__dau"))
        .groupBy("bucket")
        # sum ÷ calendar days, NOT avg over active days: days with no
        # rows must count as zero or a once-a-week product scores 1.0
        .agg((F.sum("__dau") / days_in_period).alias("avg_dau"))
    )
    per = df.groupBy(pb).agg(
        F.count_distinct(F.col(group_col)).alias("period_active")
    )
    return daily.join(per, "bucket").select(
        "bucket",
        "avg_dau",
        "period_active",
        (F.col("avg_dau") / F.col("period_active")).alias("stickiness"),
    )


def active_days_histogram(
    events: DataFrame,
    time: QueryTime,
    event: Optional[EventRef] = None,
    filters: Sequence[PropFilter] = (),
    group_col: str = EVENT_USER_COL,
) -> DataFrame:
    """(active_days, n_users) — the power-user curve over the window."""
    cond = full_filter(time, event, filters)
    df = events.filter(cond) if cond is not None else events
    per_user = df.groupBy(group_col).agg(
        F.count_distinct(bucket_col(TimeIntervalUnit.DAY)).alias("active_days")
    )
    return per_user.groupBy("active_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )
