"""Sampled-estimation oracle suite (operators/estimate.py).

The md5 sample predicate reproduces exactly in DuckDB (same mirror as
the assembly suite), so the ESTIMATES hash-match bit-for-bit — the
determinism claim under test. Rates are chosen with power-of-two
inverses (0.5, 0.25, 0.125) and the oracle MULTIPLIES by the same
exact inverse rather than dividing by the rate: n/0.25 and n*4.0
round differently in IEEE doubles for some n, and the operator
multiplies.
"""

from __future__ import annotations

import datetime as dt

from ..dsl import (
    AggFn,
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    PropertyRef,
    QueryTime,
    SegQuery,
    TimeIntervalUnit,
)
from ..operators.estimate import (
    estimated_event_segmentation,
    estimated_funnel_report,
)
from ..registry import query
from ..schema import load_table
from . import _sql as S
from .engagement import _growth_oracle
from .retention import _oracle as _retention_oracle

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


def _sampled(rate: float, seed: str = "est") -> str:
    """WHERE fragment mirroring operators/estimate.user_sample."""
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST(user_id AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) / 4294967296.0 < {rate}"
    )


def _est(spark, sf_dir, req, rate):
    return estimated_event_segmentation(
        load_table(spark, sf_dir, "events"), req, rate)


@query(
    "est_count_daily_sampled",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, event_type,
           COUNT(*) * 4.0 AS n_est
    FROM events WHERE {S.ts_between(*S.T_FULL)} AND {_sampled(0.25)}
    GROUP BY 1, 2
    """,
)
def est_count_daily_sampled(spark, sf_dir):
    """Daily event counts by type from a 25% user-coherent sample,
    Horvitz-Thompson scaled to population estimates."""
    req = EventSegmentationRequest(
        time=_FULL, interval=TimeIntervalUnit.DAY,
        events=[EventQuery(EventRef(), [SegQuery("count_events", alias="n_est")])],
        breakdowns=[PropertyRef.column("event_type")],
    )
    return _est(spark, sf_dir, req, 0.25)


@query(
    "est_dau_sampled",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket,
           COUNT(DISTINCT user_id) * 8.0 AS dau_est
    FROM events WHERE {S.ts_between(*S.T_FULL)} AND {_sampled(0.125)}
    GROUP BY 1
    """,
)
def est_dau_sampled(spark, sf_dir):
    """DAU estimated from a 12.5% sample — distinct-user counts scale
    by 1/rate because users (the distinct unit) are what was
    sampled; a per-event sample could not be rescaled this way."""
    req = EventSegmentationRequest(
        time=_FULL, interval=TimeIntervalUnit.DAY,
        events=[EventQuery(EventRef(),
                           [SegQuery("count_unique_groups", alias="dau_est")])],
    )
    return _est(spark, sf_dir, req, 0.125)


@query(
    "est_revenue_weekly_sampled",
    oracle=f"""
    SELECT {S.bucket('week')} AS bucket,
           {S.sum_exact('value')} * 2.0 AS revenue_est,
           {S.avg_exact('value')} AS aov
    FROM events
    WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      AND {_sampled(0.5)}
    GROUP BY 1
    """,
)
def est_revenue_weekly_sampled(spark, sf_dir):
    """Weekly purchase revenue from a 50% sample: the SUM scales (an
    additive total), the AVG does not (a ratio estimate is already
    consistent within the sample) — both in one request, pinning the
    per-metric scaling rule."""
    req = EventSegmentationRequest(
        time=_FULL, interval=TimeIntervalUnit.WEEK,
        events=[EventQuery(
            EventRef("purchase"),
            [
                SegQuery("aggregate_property", agg=AggFn.SUM,
                         prop=PropertyRef.column("value"), alias="revenue_est"),
                SegQuery("aggregate_property", agg=AggFn.AVG,
                         prop=PropertyRef.column("value"), alias="aov"),
            ],
        )],
    )
    return _est(spark, sf_dir, req, 0.5)


def _est_funnel_oracle(rate: float, inv: float) -> str:
    """Unique 3-step machine oracle over the sampled stream, additive
    report columns multiplied by the exact inverse (the operator's
    own arithmetic — see module docstring on why not division)."""
    import re as _re

    from .funnel import _machine_oracle_sql, _step_metric_parts

    inner = _machine_oracle_sql(
        "p.sc = 3", extra_pred=f" AND {_sampled(rate)}")
    scaled = _re.compile(
        r"^(total|completed|step\d+_(total|dropped_off|"
        r"time_to_convert(_from_start)?))$")
    names = ["bucket"] + [p.rsplit(" AS ", 1)[1] for p in _step_metric_parts()]
    sel = ", ".join(
        f"{n} * {inv} AS {n}" if scaled.match(n) else n for n in names)
    return f"SELECT {sel} FROM ({inner}) x"


@query("est_funnel_3step_sampled", oracle=_est_funnel_oracle(0.25, 4.0))
def est_funnel_3step_sampled(spark, sf_dir):
    """Unique 3-step funnel over a 25% user-coherent sample: the
    state machine sees complete user streams, so conversion ratios
    and avg times pass through; totals scale to population
    estimates."""
    from ..dsl import (
        EventFilterSpec, EventRef, FunnelRequest, FunnelStep,
        TimeIntervalUnit,
    )

    req = FunnelRequest(
        time=_FULL,
        interval=TimeIntervalUnit.DAY,
        steps=[
            FunnelStep([EventFilterSpec(EventRef("signup"))]),
            FunnelStep([EventFilterSpec(EventRef("view"))]),
            FunnelStep([EventFilterSpec(EventRef("purchase"))]),
        ],
        window_ms=7 * 86_400_000,
    )
    return estimated_funnel_report(
        load_table(spark, sf_dir, "events"), req, 0.25)


@query(
    "est_retention_weekly_sampled",
    oracle=(
        "SELECT cohort_bucket, period, cohort_size * 8.0 AS cohort_size, "
        "retained * 8.0 AS retained, pct FROM (\n"
        + _retention_oracle("signup", "purchase", 7, 8,
                            extra_pred=f" AND {_sampled(0.125)}")
        + "\n) x"
    ),
)
def est_retention_weekly_sampled(spark, sf_dir):
    """Weekly retention from a 12.5% sample: cohort_size/retained
    scale to population estimates, pct (the charted number) passes
    through unchanged — numerator and denominator scale together."""
    from ..dsl import TimeIntervalUnit
    from ..operators.estimate import estimated_retention

    return estimated_retention(
        load_table(spark, sf_dir, "events"), 0.125,
        cohort_event=EventRef("signup"),
        return_event=EventRef("purchase"),
        time=_FULL, interval=TimeIntervalUnit.WEEK, max_periods=8,
    )


@query(
    "est_growth_weekly_sampled",
    oracle=(
        "SELECT bucket, new_users * 4.0 AS new_users, "
        "retained_users * 4.0 AS retained_users, "
        "resurrected_users * 4.0 AS resurrected_users, "
        "churned_users * 4.0 AS churned_users, "
        "active_users * 4.0 AS active_users FROM (\n"
        + _growth_oracle("week", 7, extra_pred=f" AND {_sampled(0.25)}")
        + "\n) x"
    ),
)
def est_growth_weekly_sampled(spark, sf_dir):
    """Weekly growth ledger from a 25% user-coherent sample: each
    kept user's classification is EXACT (their whole timeline is
    kept), every column is an additive user count, so all five scale
    by 1/rate to population estimates."""
    from ..dsl import TimeIntervalUnit
    from ..operators.estimate import estimated_growth_accounting

    return estimated_growth_accounting(
        load_table(spark, sf_dir, "events"), 0.25,
        time=_FULL, period=TimeIntervalUnit.WEEK,
    )
