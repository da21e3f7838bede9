"""Retention / cohort-analysis oracle suite (beyond the reference —
it ships no retention operator; see operators/retention.py)."""

from __future__ import annotations

import datetime as dt

from ..dsl import EventRef, QueryTime, TimeIntervalUnit
from ..operators.retention import retention
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


def _oracle(cohort_ev: str, return_ev: str, unit_days: int, max_p: int,
            unbounded: bool = False, extra_pred: str = "",
            time=S.T_FULL) -> str:
    """``extra_pred``: extra " AND ..." clause on both event scans
    (the estimation suite's user-sample predicate)."""
    trunc = {1: "day", 7: "week"}[unit_days]
    if not unbounded:
        retained = f"""
        SELECT cb AS cohort_bucket, p AS period,
               COUNT(DISTINCT user_id) AS retained
        FROM j GROUP BY 1, 2
        """
    else:
        retained = f"""
        SELECT cb AS cohort_bucket, gs.period, COUNT(*) AS retained
        FROM (SELECT user_id, cb, MAX(p) AS h FROM j GROUP BY 1, 2) hs,
             LATERAL (SELECT UNNEST(generate_series(1, hs.h)) AS period) gs
        GROUP BY 1, 2
        """
    return f"""
    WITH cohorts AS (
      SELECT user_id, MIN({S.bucket(trunc)}) AS cb
      FROM events
      WHERE {S.ts_between(*time)} AND event_type = '{cohort_ev}'{extra_pred}
      GROUP BY 1
    ), sizes AS (
      SELECT cb AS cohort_bucket, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1
    ), rets AS (
      SELECT DISTINCT user_id, {S.bucket(trunc)} AS rb
      FROM events
      WHERE {S.ts_between(*time)} AND event_type = '{return_ev}'{extra_pred}
    ), j AS (
      SELECT c.cb, date_diff('day', c.cb, r.rb) // {unit_days} AS p, c.user_id
      FROM cohorts c JOIN rets r USING (user_id)
      WHERE date_diff('day', c.cb, r.rb) // {unit_days} BETWEEN 1 AND {max_p}
    ), retained AS ({retained}),
    z AS (
      SELECT cohort_bucket, 0 AS period, cohort_size AS retained FROM sizes
    ), unioned AS (
      SELECT * FROM z UNION ALL SELECT * FROM retained
    )
    SELECT u.cohort_bucket, CAST(u.period AS INT) AS period, s.cohort_size,
           u.retained, CAST(u.retained AS DOUBLE) / s.cohort_size AS pct
    FROM unioned u JOIN sizes s USING (cohort_bucket)
    """


@query("retention_weekly_signup_purchase",
       oracle=_oracle("signup", "purchase", 7, 8))
def retention_weekly_signup_purchase(spark, sf_dir):
    """Classic N-week retention triangle: users cohorted by their
    first signup week, retained when they purchase in week W+k."""
    return retention(
        load_table(spark, sf_dir, "events"),
        cohort_event=EventRef("signup"),
        return_event=EventRef("purchase"),
        time=_FULL,
        interval=TimeIntervalUnit.WEEK,
        max_periods=8,
    )


@query("retention_daily_view_click",
       oracle=_oracle("view", "click", 1, 10))
def retention_daily_view_click(spark, sf_dir):
    """Day-grain retention with a high-frequency cohort event — the
    return side reduces to distinct (user, day) pairs before the join,
    so the join input is user×day-scale, not event-scale."""
    return retention(
        load_table(spark, sf_dir, "events"),
        cohort_event=EventRef("view"),
        return_event=EventRef("click"),
        time=_FULL,
        interval=TimeIntervalUnit.DAY,
        max_periods=10,
    )


#: day-aligned window (µs end) — required for rollup routing
_T_DAYS = ("2024-01-01 00:00:00", "2024-01-31 23:59:59.999999")
_FULL_DAYS = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59, 999999)
)


@query(
    "retention_cohort_sizes_rollup",
    oracle=f"""
    WITH cohorts AS (
      SELECT user_id, MIN({S.bucket('week')}) AS cb
      FROM events
      WHERE {S.ts_between(*_T_DAYS)} AND event_type = 'signup'
      GROUP BY 1
    )
    SELECT cb AS cohort_bucket, COUNT(*) AS cohort_size
    FROM cohorts GROUP BY 1
    """,
)
def retention_cohort_sizes_rollup(spark, sf_dir):
    """Weekly signup-cohort sizes answered from the persisted day
    rollup (rollup.cohort_sizes_from_rollup): first-touch counts
    recovered as differences of CUMULATIVE day-sketch unions — the
    cohort axis of the retention triangle without a raw-events scan.
    The oracle computes exact per-user first-touch buckets on raw
    events; they hash-match while the sketches are in their exact
    sparse regime (test scale), and degrade to ± ~1% estimates at
    100 TB cardinalities."""
    from ..rollup import cohort_sizes_from_rollup
    from .rollup import _SPEC, persisted_store

    store = persisted_store(spark, sf_dir)
    return cohort_sizes_from_rollup(
        store.read(spark), _FULL_DAYS,
        interval=TimeIntervalUnit.WEEK,
        cohort_event=EventRef("signup"), spec=_SPEC)


@query("retention_unbounded_weekly",
       oracle=_oracle("signup", "view", 7, 8, unbounded=True))
def retention_unbounded_weekly(spark, sf_dir):
    """Unbounded retention ("still active at or after week k"): a user
    counts at every period ≤ their max return period — the
    churn-friendly monotone curve."""
    return retention(
        load_table(spark, sf_dir, "events"),
        cohort_event=EventRef("signup"),
        return_event=EventRef("view"),
        time=_FULL,
        interval=TimeIntervalUnit.WEEK,
        max_periods=8,
        unbounded=True,
    )


#: µs-aligned bounds for the user-day-routed twin (whole-day windows
#: are what user_day_supports requires) + matching SQL bounds
_FULL_DAYS = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
_T_DAYS = ("2024-01-01 00:00:00", "2024-01-31 23:59:59.999999")


@query("retention_weekly_routed",
       oracle=_oracle("signup", "purchase", 7, 8, time=_T_DAYS))
def retention_weekly_routed(spark, sf_dir):
    """The weekly retention triangle served FROM the (dt, user)
    activity store (userday.retention_from_user_day, r15): cohorts,
    sizes, and the distinct return pairs — the matrix tail's entire
    input — fold from persisted partials, then the SHARED
    retention_matrix runs. Shares the raw oracle: hash-matching it
    proves routed ≡ raw ≡ oracle on the third standing engagement
    surface (after RFM and growth)."""
    from ..suites.engagement import persisted_user_day_store
    from ..userday import retention_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return retention_from_user_day(
        st.read(spark), EventRef("signup"), EventRef("purchase"),
        _FULL_DAYS, TimeIntervalUnit.WEEK, max_periods=8)
