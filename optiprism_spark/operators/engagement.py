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
    # ONE full-scan pass instead of two joined branches (guide §2.4):
    # Σ_days DAU(day) ≡ Σ_users (active days of the user) within the
    # period, so one per-(period, user) distinct-day count yields BOTH
    # outputs — avg_dau as sum(active days)/calendar days and
    # period_active as the row count — with no join and no second
    # scan. Values are bit-identical to the two-branch shape: both
    # are integer sums divided by the same literals.
    pb = bucket_col(period).alias("bucket")
    db = bucket_col(TimeIntervalUnit.DAY)
    days_in_period = (
        F.lit(7)
        if period == TimeIntervalUnit.WEEK
        else F.dayofmonth(F.last_day(F.col("bucket")))
    )
    per_user = df.groupBy(pb, F.col(group_col).alias("__u")).agg(
        F.count_distinct(db).alias("__nd")
    )
    return per_user.groupBy("bucket").agg(
        (F.sum("__nd") / days_in_period).alias("avg_dau"),
        F.count(F.lit(1)).alias("period_active"),
    ).select(
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


def lness_grid(
    events: DataFrame,
    anchor: "datetime.date",
    l_short: int = 7,
    l_long: int = 28,
    event: Optional[EventRef] = None,
    filters: Sequence[PropFilter] = (),
    group_col: str = EVENT_USER_COL,
) -> DataFrame:
    """(l_short, l_long, n_users) — the L7/L28 engagement grid.

    For every user active in the trailing ``l_long``-day window ending
    at ``anchor`` (inclusive), count their distinct active days in the
    full window (``l_long``) and in the trailing ``l_short`` days
    (``l_short``), then histogram the (l_short, l_long) pairs. The
    grid is the standard habit-strength read (casual vs core vs power
    users in one table); the l_short/l_long ratio per cell is the
    classic L7/L28 "lness" metric.

    Shape: one filtered scan → one per-user aggregate carrying BOTH
    distinct-day counts (the short window is a conditional
    count-distinct over the same day column, no second scan) → a
    cells-cardinality histogram groupBy. Per-user state never leaves
    the executors unaggregated, so the plan scales like
    active_days_histogram regardless of window length."""
    import datetime as _dt

    if not (1 <= l_short < l_long):
        raise ValueError(
            f"need 1 <= l_short < l_long, got {l_short}/{l_long}")
    lo = anchor - _dt.timedelta(days=l_long - 1)
    short_lo = anchor - _dt.timedelta(days=l_short - 1)
    time = QueryTime.between(
        _dt.datetime.combine(lo, _dt.time.min),
        _dt.datetime.combine(anchor, _dt.time(23, 59, 59, 999999)))
    cond = full_filter(time, event, filters)
    df = events.filter(cond) if cond is not None else events
    day = bucket_col(TimeIntervalUnit.DAY)
    # two-phase instead of two count_distincts: a multi-distinct
    # aggregate plans an Expand that doubles every input row into the
    # exchange (one copy per distinct group). Deduplicating to
    # (user, day) grain first is ONE map-side-combinable aggregate —
    # no row multiplication, half the shuffled pairs — and both
    # window counts become plain conditional counts over rows that
    # are distinct by construction.
    per_user_day = df.select(
        F.col(group_col), day.alias("__day")).distinct()
    per_user = per_user_day.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("l_long"),
        F.count(F.when(F.col("__day") >= F.lit(short_lo), F.lit(1)))
        .alias("l_short"),
    )
    return per_user.groupBy("l_short", "l_long").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def growth_accounting(
    events: DataFrame,
    time: QueryTime,
    period: TimeIntervalUnit = TimeIntervalUnit.WEEK,
    event: Optional[EventRef] = None,
    filters: Sequence[PropFilter] = (),
    group_col: str = EVENT_USER_COL,
) -> DataFrame:
    """Growth accounting (the Social-Capital-style ledger — beyond the
    reference): per period bucket, how many users are

    - ``new_users``: active this bucket, never seen before;
    - ``retained_users``: active this bucket AND the immediately
      previous one;
    - ``resurrected_users``: active this bucket after a gap of at
      least one full bucket;
    - ``churned_users``: active the previous bucket but not this one
      (attributed to the bucket they went quiet IN — the standard
      convention, so new+retained+resurrected−churned telescopes to
      the period-over-period active delta);
    - ``active_users`` = new + retained + resurrected (convenience).

    "Seen before" is scoped to the query window (the same convention
    the cohort retention operator uses): a user whose history starts
    before the window reads as new in their first in-window bucket.
    Churn rows are capped at the window's last observed bucket — the
    bucket AFTER the last one would otherwise report everyone as
    churned off the edge.

    Scale shape: ONE user-hash exchange — the per-user sorted
    distinct bucket array folds via sort_array(collect_set(bucket))
    with map-side partial aggregation (a task's partial set is ≤
    #buckets per user), and prev/next come from array indexing, so
    the old distinct-exchange + window-exchange stack (and its
    per-partition sort) collapses into the one aggregate. No skew:
    a user's state is ≤ #buckets dates. The final conditional count
    groups by bucket (tiny). The window-end cap is a 1-row broadcast
    join, not a collect. Counts are integers, so the whole report is
    hash-exact against the oracle.
    """
    if period not in (TimeIntervalUnit.DAY, TimeIntervalUnit.WEEK,
                      TimeIntervalUnit.MONTH):
        raise ValueError("growth accounting period must be day|week|month")
    cond = full_filter(time, event, filters)
    df = events.filter(cond) if cond is not None else events
    a = df.select(
        F.col(group_col).alias("__u"),
        bucket_col(period).alias("bucket"),
    )
    last_b = df.agg(
        F.max(bucket_col(period)).alias("__last")).withColumn(
        "__k", F.lit(1))
    return growth_ledger(a, last_b, period)


def growth_ledger(a: DataFrame, last_b: DataFrame,
                  period: TimeIntervalUnit) -> DataFrame:
    """The ledger tail shared by the raw path above and the user-day
    rollup route (userday.growth_from_user_day): ``a`` is the
    (``__u``, ``bucket``) activity frame (duplicates fine — the
    per-user set fold dedups), ``last_b`` a 1-row frame (``__last``,
    ``__k=1``) capping window-edge churn. Keeping one implementation
    makes routed ≡ raw an equality of INPUTS — the (user, bucket)
    activity set is identical by construction — not of two ledger
    codepaths."""

    def _next(b: str) -> str:
        if period == TimeIntervalUnit.MONTH:
            return f"add_months({b}, 1)"
        return f"date_add({b}, {7 if period == TimeIntervalUnit.WEEK else 1})"

    # ONE user-hash exchange: sort_array(collect_set(bucket)) dedups
    # AND orders each user's activity with map-side partial
    # aggregation, replacing the old distinct-on-(u,bucket) exchange
    # + lag/lead-window-on-(u) exchange + per-partition sort. Both
    # neighbours then come from array indexing (guarded CASEs keep
    # out-of-range indexing unevaluated under ANSI), and one explode
    # emits both ledger rows per (user, bucket): the status row and,
    # when the user goes quiet afterwards, the churn row at bucket+1.
    # bucket is never null here (both callers derive it from time-
    # window-filtered timestamps), so collect_set ≡ distinct. The
    # window-edge churn cap joins a 1-row broadcast max computed from
    # the raw scan (max needs no distinct, so it is the cheaper
    # second pass; the kinds pipeline itself stays one scan → one
    # exchange). Everything below builds as parsed SQL: the Column-
    # tree version of this ledger was ~1200 py4j round-trips ≈ 0.3 s
    # of driver time per call (guide §7.3).
    per_user = a.groupBy("__u").agg(
        F.expr("sort_array(collect_set(bucket)) AS __bs"))
    x = per_user.select(
        F.expr("__bs"),
        F.expr("posexplode(__bs) AS (__i, bucket)"),
    ).selectExpr(
        "bucket",
        "CASE WHEN __i > 0 THEN __bs[__i - 1] END AS __prev",
        "CASE WHEN __i < size(__bs) - 1 THEN __bs[__i + 1] END AS __next",
    )
    status = ("CASE WHEN __prev IS NULL THEN 'new' "
              f"WHEN {_next('__prev')} = bucket THEN 'retained' "
              "ELSE 'resurrected' END")
    churn_bucket = (f"CASE WHEN __next IS NULL OR __next > {_next('bucket')} "
                    f"THEN {_next('bucket')} END")
    kinds = (
        x.selectExpr(
            "explode(array("
            f"struct(bucket, {status} AS __kind), "
            f"struct({churn_bucket} AS bucket, 'churned' AS __kind)"
            ")) AS __e",
        )
        .selectExpr("__e.bucket AS bucket", "__e.__kind AS __kind")
        .filter(F.col("bucket").isNotNull())
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(last_b), "__k")
        .filter(F.col("bucket") <= F.col("__last"))
        .select("bucket", "__kind")
    )

    def _n(kind: str, alias: str):
        return F.expr(
            f"SUM(CAST((__kind = '{kind}') AS BIGINT)) AS {alias}")

    return kinds.groupBy("bucket").agg(
        _n("new", "new_users"),
        _n("retained", "retained_users"),
        _n("resurrected", "resurrected_users"),
        _n("churned", "churned_users"),
    ).selectExpr(
        "bucket", "new_users", "retained_users", "resurrected_users",
        "churned_users",
        "new_users + retained_users + resurrected_users AS active_users",
    )


def rfm_scores(
    events: DataFrame,
    time: QueryTime,
    n_tiles: int = 5,
    value_col: str = "value",
    event: Optional[EventRef] = None,
    filters: Sequence[PropFilter] = (),
    group_col: str = EVENT_USER_COL,
    percentile_mode: str = "auto",
) -> DataFrame:
    """RFM scoring (beyond the reference): per user, recency /
    frequency / monetary raw values plus equi-depth 1..n_tiles scores
    (5-4-1 convention: 5 = most recent, most frequent, highest
    spend). The classic CRM segmentation — "champions" are 5-5-5,
    "at-risk big spenders" low-R high-M.

    - ``recency_days``: days from the user's last in-window active
      day to the window's end date (needs a bounded window —
      ``QueryTime.between``/``last``);
    - ``frequency``: in-window event count;
    - ``monetary``: exact DECIMAL sum of ``value_col`` (0 when the
      user never carries a value).

    Scores come from percentile edges over the per-user frame — ONE
    1-row aggregate broadcast back onto it (the drift equi-depth /
    curriculum recipe), never an ntile over a single global window
    (that would sort every user through one task). Ties sit in the
    lower tile on both engines (strict > comparisons), so heavily-
    tied dimensions (frequency at small counts) bucket
    deterministically.

    ``percentile_mode`` (operators/edges.py): "auto" (default) runs
    EXACT interpolated percentiles — the hash-oracle regime — while
    the per-user frame stays under sizing.EXACT_PERCENTILE_MAX_ROWS,
    and switches to percentile_approx beyond it (exact percentile's
    final aggregate buffers every user's value on one task — the OOM
    seam at 10⁹ users). The decision lands in
    optiprism_percentile_edge_mode_total{surface="rfm"}.

    Scale shape: one map-side-combinable groupBy(user) over the
    filtered scan (persisted — it feeds both the edge aggregate and
    the scoring join), one tiny aggregate, one broadcast join, pure
    per-row score arithmetic. Integer/decimal outputs — hash-exact
    in the exact regime.
    """
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    _, end = time.range()
    if end is None:
        raise ValueError("rfm_scores needs a bounded time window")
    from ..operators.aggregates import DECIMAL_T

    cond = full_filter(time, event, filters)
    df = events.filter(cond) if cond is not None else events
    per_user = df.groupBy(F.col(group_col)).agg(
        F.datediff(
            F.lit(end.date().isoformat()).cast("date"),
            F.max(bucket_col(TimeIntervalUnit.DAY)),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.col(value_col).cast(DECIMAL_T)), F.lit(0).cast(DECIMAL_T)
        ).cast("double").alias("monetary"),
    )
    return rfm_from_per_user(per_user, n_tiles, group_col, percentile_mode)


def rfm_from_per_user(per_user: DataFrame, n_tiles: int,
                      group_col: str = EVENT_USER_COL,
                      percentile_mode: str = "auto") -> DataFrame:
    """The scoring tail shared by the raw path above and the user-day
    rollup route (userday.rfm_from_user_day): ``per_user`` carries
    (group_col, recency_days, frequency, monetary). One
    implementation means routed ≡ raw is an equality of the per-user
    FRAME, not of two scoring codepaths."""
    from ._util import track_persist
    from .edges import percentile_edges

    if percentile_mode == "auto":
        # auto mode adds a COUNT over the frame to pick the regime —
        # persist so the count, the edge aggregate, and the scoring
        # join share one materialization. Explicit modes skip it: the
        # edge aggregate and the join re-derive the groupBy once each
        # (AQE exchange reuse shares the heavy shuffle), and an
        # operator-held cache would make every raw-vs-routed timing
        # comparison measure the cache instead of the plan.
        per_user = track_persist(per_user)
    qs = [i / n_tiles for i in range(1, n_tiles)]
    edges, _mode = percentile_edges(
        per_user,
        [("recency_days", qs, "r"), ("frequency", qs, "f"),
         ("monetary", qs, "m")],
        mode=percentile_mode, surface="rfm")
    x = per_user.withColumn("__k", F.lit(1)).join(F.broadcast(edges), "__k")

    def _phase(col: str, prefix: str):
        import functools

        return functools.reduce(
            lambda acc, i: acc
            + (F.col(col).cast("double") > F.col(f"__{prefix}{i}"))
            .cast("int"),
            range(len(qs)),
            F.lit(0),
        )

    return x.select(
        F.col(group_col),
        "recency_days",
        "frequency",
        "monetary",
        # low recency = good: invert the phase
        (F.lit(n_tiles) - _phase("recency_days", "r")).alias("r_score"),
        (F.lit(1) + _phase("frequency", "f")).alias("f_score"),
        (F.lit(1) + _phase("monetary", "m")).alias("m_score"),
    )
