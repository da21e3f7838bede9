"""Engagement oracle suite: stickiness, activity histogram, and the
LTV revenue-cohort matrix (operators/engagement.py, retention.py —
beyond the reference)."""

from __future__ import annotations

import datetime as dt

from ..dsl import EventRef, QueryTime, TimeIntervalUnit
from ..operators.engagement import active_days_histogram, stickiness
from ..operators.retention import revenue_cohorts
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


@query(
    "eng_stickiness_weekly",
    oracle=f"""
    WITH daily AS (
      SELECT {S.bucket('week')} AS bucket, {S.bucket('day')} AS d,
             COUNT(DISTINCT user_id) AS dau
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1, 2
    ), avg_d AS (
      -- sum over 7 calendar days, not AVG over active days: a week
      -- with zero-activity days must read lower, not identical
      SELECT bucket, SUM(dau) / 7 AS avg_dau FROM daily GROUP BY 1
    ), weekly AS (
      SELECT {S.bucket('week')} AS bucket, COUNT(DISTINCT user_id) AS period_active
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1
    )
    SELECT a.bucket, a.avg_dau, w.period_active,
           a.avg_dau / w.period_active AS stickiness
    FROM avg_d a JOIN weekly w USING (bucket)
    """,
)
def eng_stickiness_weekly(spark, sf_dir):
    """DAU/WAU stickiness trend — the engagement-health ratio the
    reference's DAU/WAU/MAU series stop short of."""
    return stickiness(load_table(spark, sf_dir, "events"), _FULL,
                      period=TimeIntervalUnit.WEEK)


#: day-aligned window (µs end) — required for rollup routing; the
#: oracle uses the SAME bounds so both paths see identical rows
_T_DAYS = ("2024-01-01 00:00:00", "2024-01-31 23:59:59.999999")
_FULL_DAYS = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59, 999999)
)


@query(
    "eng_stickiness_weekly_rollup",
    oracle=f"""
    WITH daily AS (
      SELECT {S.bucket('week')} AS bucket, {S.bucket('day')} AS d,
             COUNT(DISTINCT user_id) AS dau
      FROM events WHERE {S.ts_between(*_T_DAYS)}
      GROUP BY 1, 2
    ), avg_d AS (
      SELECT bucket, SUM(dau) / 7 AS avg_dau FROM daily GROUP BY 1
    ), weekly AS (
      SELECT {S.bucket('week')} AS bucket, COUNT(DISTINCT user_id) AS period_active
      FROM events WHERE {S.ts_between(*_T_DAYS)}
      GROUP BY 1
    )
    SELECT a.bucket, a.avg_dau, w.period_active,
           a.avg_dau / w.period_active AS stickiness
    FROM avg_d a JOIN weekly w USING (bucket)
    """,
)
def eng_stickiness_weekly_rollup(spark, sf_dir):
    """The SAME stickiness trend answered from the persisted day-grain
    rollup (rollup.stickiness_from_rollup): daily actives from per-day
    HLL sketches, weekly actives from their union — the scan is the
    materialized parquet store, never raw events, yet the oracle runs
    exact distincts on raw events. Hash-matching works because the
    sketches stay in their exact sparse regime at test cardinalities;
    at 100 TB the same query returns ± ~1% estimates (documented in
    rollup.py), which is the right trade for the most-refreshed
    dashboard surface."""
    from ..rollup import stickiness_from_rollup
    from .rollup import _SPEC, persisted_store

    store = persisted_store(spark, sf_dir)
    return stickiness_from_rollup(
        store.read(spark), _FULL_DAYS,
        period=TimeIntervalUnit.WEEK, spec=_SPEC)


@query(
    "eng_active_days_histogram",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, COUNT(DISTINCT {S.bucket('day')}) AS active_days
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1
    )
    SELECT active_days, COUNT(*) AS n_users FROM per_user GROUP BY 1
    """,
)
def eng_active_days_histogram(spark, sf_dir):
    """Power-user curve: users by #distinct active days in January."""
    return active_days_histogram(load_table(spark, sf_dir, "events"), _FULL)


@query(
    "retention_revenue_weekly",
    oracle=f"""
    WITH cohorts AS (
      SELECT user_id, MIN({S.bucket('week')}) AS cb
      FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'signup'
      GROUP BY 1
    ), sizes AS (
      SELECT cb AS cohort_bucket, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1
    ), rev AS (
      SELECT user_id, {S.bucket('week')} AS rb,
             SUM(CAST(value AS {S.DECIMAL_T})) AS r
      FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      GROUP BY 1, 2
    ), per AS (
      SELECT c.cb AS cohort_bucket,
             CAST(date_diff('day', c.cb, r.rb) // 7 AS INT) AS period,
             SUM(r.r) AS rev_dec
      FROM cohorts c JOIN rev r USING (user_id)
      WHERE date_diff('day', c.cb, r.rb) // 7 BETWEEN 0 AND 8
      GROUP BY 1, 2
    )
    SELECT p.cohort_bucket, p.period, s.cohort_size,
           CAST(p.rev_dec AS DOUBLE) AS revenue,
           CAST(SUM(p.rev_dec) OVER (
             PARTITION BY p.cohort_bucket ORDER BY p.period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_revenue,
           CAST(SUM(p.rev_dec) OVER (
             PARTITION BY p.cohort_bucket ORDER BY p.period
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / s.cohort_size AS ltv
    FROM per p JOIN sizes s ON p.cohort_bucket = s.cohort_bucket
    """,
)
def retention_revenue_weekly(spark, sf_dir):
    """LTV curve: cohorted by first signup week, purchase revenue per
    period (exact decimal sums; cumulative on decimal then cast)."""
    return revenue_cohorts(
        load_table(spark, sf_dir, "events"),
        cohort_event=EventRef("signup"),
        revenue_event=EventRef("purchase"),
        time=_FULL,
        interval=TimeIntervalUnit.WEEK,
        max_periods=8,
    )


def _growth_oracle(unit: str, step_days: int, time=S.T_FULL,
                   extra_pred: str = "") -> str:
    return f"""
    WITH a AS (
      SELECT DISTINCT user_id AS u, {S.bucket(unit)} AS bucket
      FROM events WHERE {S.ts_between(*time)}{extra_pred}
    ), lastb AS (
      SELECT max(bucket) AS last_b FROM a
    ), x AS (
      SELECT u, bucket,
             lag(bucket) OVER (PARTITION BY u ORDER BY bucket) AS prev,
             lead(bucket) OVER (PARTITION BY u ORDER BY bucket) AS nxt
      FROM a
    ), kinds AS (
      SELECT bucket,
             CASE WHEN prev IS NULL THEN 'new'
                  WHEN prev + {step_days} = bucket THEN 'retained'
                  ELSE 'resurrected' END AS kind
      FROM x
      UNION ALL
      SELECT bucket + {step_days}, 'churned'
      FROM x, lastb
      WHERE (nxt IS NULL OR nxt > bucket + {step_days})
        AND bucket + {step_days} <= last_b
    )
    SELECT bucket,
           count(*) FILTER (kind = 'new') AS new_users,
           count(*) FILTER (kind = 'retained') AS retained_users,
           count(*) FILTER (kind = 'resurrected') AS resurrected_users,
           count(*) FILTER (kind = 'churned') AS churned_users,
           count(*) FILTER (kind <> 'churned') AS active_users
    FROM kinds GROUP BY 1
    """


@query("eng_growth_accounting_weekly", oracle=_growth_oracle("week", 7))
def eng_growth_accounting_weekly(spark, sf_dir):
    """Weekly growth-accounting ledger: new / retained / resurrected
    / churned / active user counts per week (churn attributed to the
    week the user went quiet in, capped at the window's last week)."""
    from ..operators.engagement import growth_accounting

    return growth_accounting(
        load_table(spark, sf_dir, "events"), _FULL,
        period=TimeIntervalUnit.WEEK)


@query("eng_growth_accounting_daily", oracle=_growth_oracle("day", 1))
def eng_growth_accounting_daily(spark, sf_dir):
    """Daily-grain growth accounting — same ledger at day resolution
    (the grain DAU dashboards drill into)."""
    from ..operators.engagement import growth_accounting

    return growth_accounting(
        load_table(spark, sf_dir, "events"), _FULL,
        period=TimeIntervalUnit.DAY)


def _rfm_per_user(time=S.T_FULL) -> str:
    end_date = time[1].split(" ")[0]
    return f"""
      SELECT user_id,
             date_diff('day', MAX({S.bucket('day')}), DATE '{end_date}')
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(COALESCE(SUM(CAST(value AS {S.DECIMAL_T})), 0) AS DOUBLE)
               AS monetary
      FROM events WHERE {S.ts_between(*time)}
      GROUP BY 1
"""


def _rfm_edges(n_tiles: int = 5) -> str:
    qs = [i / n_tiles for i in range(1, n_tiles)]
    cols = []
    for p, col in (("r", "recency_days"), ("f", "frequency"),
                   ("m", "monetary")):
        cols += [f"quantile_cont({col}, {q!r}) AS {p}{i}"
                 for i, q in enumerate(qs)]
    return "SELECT " + ", ".join(cols) + " FROM pu"


def _tile(col: str, p: str, n: int = 4) -> str:
    return " + ".join(
        f"CAST({col} > {p}{i} AS INT)" for i in range(n))


def _rfm_scored(n_tiles: int = 5) -> str:
    k = n_tiles - 1
    return f"""
      SELECT user_id, recency_days, frequency, monetary,
             {n_tiles} - ({_tile('recency_days', 'r', k)}) AS r_score,
             1 + ({_tile('frequency', 'f', k)}) AS f_score,
             1 + ({_tile('monetary', 'm', k)}) AS m_score
      FROM pu, e
"""


def _rfm_oracle(n_tiles: int = 5, time=S.T_FULL, grid: bool = False) -> str:
    body = f"""
    WITH pu AS ({_rfm_per_user(time)}), e AS ({_rfm_edges(n_tiles)})
    {_rfm_scored(n_tiles)}
    """
    if not grid:
        return body
    return f"""
    WITH pu AS ({_rfm_per_user(time)}), e AS ({_rfm_edges(n_tiles)}),
    scored AS ({_rfm_scored(n_tiles)})
    SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
           CAST(SUM(CAST(monetary AS {S.DECIMAL_T})) AS DOUBLE)
             AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    """

_RFM_PER_USER = _rfm_per_user()
_RFM_EDGES = _rfm_edges()
_RFM_SCORED = _rfm_scored()


@query(
    "eng_rfm_scores",
    oracle=f"""
    WITH pu AS ({_RFM_PER_USER}), e AS ({_RFM_EDGES})
    {_RFM_SCORED}
    """,
)
def eng_rfm_scores(spark, sf_dir):
    """Per-user RFM: raw recency/frequency/monetary plus equi-depth
    quintile scores (5 = best) from broadcast percentile edges."""
    from ..operators.engagement import rfm_scores

    return rfm_scores(load_table(spark, sf_dir, "events"), _FULL)


@query(
    "eng_rfm_segment_counts",
    oracle=f"""
    WITH pu AS ({_RFM_PER_USER}), e AS ({_RFM_EDGES}),
    scored AS ({_RFM_SCORED})
    SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
           CAST(SUM(CAST(monetary AS {S.DECIMAL_T})) AS DOUBLE)
             AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def eng_rfm_segment_counts(spark, sf_dir):
    """The RFM segment grid: user counts and total spend per
    (r, f, m) cell — the frame a CRM heatmap renders."""
    import pyspark.sql.functions as F

    from ..operators.aggregates import DECIMAL_T
    from ..operators.engagement import rfm_scores

    return rfm_scores(
        load_table(spark, sf_dir, "events"), _FULL
    ).groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("monetary").cast(DECIMAL_T)).cast("double")
        .alias("total_monetary"),
    )


#: persisted (dt, user, event_type) store per (process, sf_dir) — the
#: user-grain pre-aggregate the routed RFM / growth queries below
#: serve from (userday.UserDayStore; r15, r14 verdict tasks 6 & 7).
#: Mirrors the rollup suite's persisted_store: routed queries read
#: THIS parquet, not an in-memory frame whose lineage reaches raw
#: events.
_UD_STORES: dict = {}

#: µs-aligned twin of _FULL — the whole-day bounds user_day_supports
#: requires; the routed oracles below use the matching SQL bounds
_FULL_DAYS = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
_T_DAYS = ("2024-01-01 00:00:00", "2024-01-31 23:59:59.999999")


def persisted_user_day_store(spark, sf_dir: str):
    from ..userday import UserDayStore

    st = _UD_STORES.get(sf_dir)
    if st is None:
        import atexit
        import os
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="optiprism_userday_suite_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        st = UserDayStore(os.path.join(d, "userday"))
        st.rebuild(spark, load_table(spark, sf_dir, "events"))
        _UD_STORES[sf_dir] = st
    return st


@query("eng_rfm_scores_routed", oracle=_rfm_oracle(time=_T_DAYS))
def eng_rfm_scores_routed(spark, sf_dir):
    """RFM served FROM the user-day store (userday.rfm_from_user_day):
    the per-user frame folds from persisted (dt, user) partials —
    recency from max(dt), frequency from Σn_events, monetary from
    exact decimal Σvalue_sum — and runs the SAME scoring tail as the
    raw path. Shares eng_rfm_scores' oracle: hash-matching it proves
    routed ≡ raw ≡ oracle, so the standing /queries/rfm dashboard
    surface stops rescanning raw events."""
    from ..userday import rfm_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return rfm_from_user_day(st.read(spark), _FULL_DAYS)


@query("eng_growth_weekly_routed",
       oracle=_growth_oracle("week", 7, time=_T_DAYS))
def eng_growth_weekly_routed(spark, sf_dir):
    """The weekly growth-accounting ledger served FROM the user-day
    store (userday.growth_from_user_day): the distinct (user, bucket)
    activity set — the ledger's entire input — is a projection of the
    persisted (dt, user) partials, then the SHARED growth_ledger tail
    runs. Shares eng_growth_accounting_weekly's oracle."""
    from ..userday import growth_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return growth_from_user_day(st.read(spark), _FULL_DAYS,
                                period=TimeIntervalUnit.WEEK)


@query(
    "eng_active_days_routed",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, COUNT(DISTINCT {S.bucket('day')}) AS active_days
      FROM events WHERE {S.ts_between(*_T_DAYS)}
      GROUP BY 1
    )
    SELECT active_days, COUNT(*) AS n_users FROM per_user GROUP BY 1
    """,
)
def eng_active_days_routed(spark, sf_dir):
    """The power-user curve served FROM the user-day store: a user's
    distinct active days are exactly their store rows' distinct dt
    values (userday.active_days_from_user_day) — the fourth standing
    engagement surface off the same partials, sharing the raw path's
    oracle shape."""
    from ..userday import active_days_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return active_days_from_user_day(st.read(spark), _FULL_DAYS)


@query(
    "eng_active_users_weekly_routed",
    oracle=f"""
    SELECT {S.bucket('week')} AS bucket,
           COUNT(DISTINCT user_id) AS active_users
    FROM events WHERE {S.ts_between(*_T_DAYS)}
    GROUP BY 1
    """,
)
def eng_active_users_weekly_routed(spark, sf_dir):
    """EXACT weekly active users served FROM the user-day store
    (userday.active_users_from_user_day) — the no-error twin of the
    estimate family's sampled DAU and the rollup tier's ±1% KMV
    series: a bucket's active users are the distinct user ids of its
    (dt, user) partials, so the count is exact, and the scan is the
    bounded store with dt pruning instead of raw events."""
    from ..userday import active_users_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return active_users_from_user_day(
        st.read(spark), _FULL_DAYS, TimeIntervalUnit.WEEK)


#: L7/L28 anchored at the last day the 28-day window fits inside the
#: January corpus; both paths and the oracle derive their bounds from
#: these three constants
_LNESS_ANCHOR = dt.date(2024, 1, 28)
_LNESS_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id,
             COUNT(DISTINCT {S.bucket('day')}) AS l_long,
             COUNT(DISTINCT CASE WHEN {S.bucket('day')} >= DATE '2024-01-22'
                                 THEN {S.bucket('day')} END) AS l_short
      FROM events
      WHERE {S.ts_between('2024-01-01 00:00:00', '2024-01-28 23:59:59.999999')}
      GROUP BY 1
    )
    SELECT l_short, l_long, COUNT(*) AS n_users
    FROM per_user GROUP BY 1, 2
    """


@query("eng_l7_l28_grid", oracle=_LNESS_ORACLE)
def eng_l7_l28_grid(spark, sf_dir):
    """The L7/L28 habit-strength grid (engagement.lness_grid): users
    by (distinct active days in the trailing 7, distinct active days
    in the trailing 28) ending Jan 28 — the standard casual/core/
    power segmentation, one conditional count-distinct pass."""
    from ..operators.engagement import lness_grid

    return lness_grid(load_table(spark, sf_dir, "events"), _LNESS_ANCHOR)


@query("eng_l7_l28_grid_routed", oracle=_LNESS_ORACLE)
def eng_l7_l28_grid_routed(spark, sf_dir):
    """The SAME grid served FROM the user-day store
    (userday.lness_from_user_day): both distinct-day counts are
    counts over the user's persisted dt values, so routed ≡ raw is
    input equality — the sixth standing engagement surface off the
    (dt, user) partials, sharing the raw path's oracle."""
    from ..userday import lness_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return lness_from_user_day(st.read(spark), _LNESS_ANCHOR)
