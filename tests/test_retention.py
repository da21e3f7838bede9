"""Retention / engagement semantics pinned on a hand-computed fixture
(the oracle suite checks engine≡DuckDB; this checks both against a
human-computed truth, so a shared misunderstanding cannot pass)."""

from __future__ import annotations

import datetime as dt

import pytest

from optiprism_spark.dsl import EventRef, QueryTime, TimeIntervalUnit
from optiprism_spark.operators.engagement import active_days_histogram, stickiness
from optiprism_spark.operators.retention import retention, revenue_cohorts

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
WINDOW = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


@pytest.fixture(scope="module")
def events(spark):
    def e(i, day, user, ev, value=0.0):
        return (i, T0 + dt.timedelta(days=day), user, ev, value, "{}")

    rows = [
        # u1: cohort day0; purchases day1 ($10) and day3 ($5)
        e(1, 0, 1, "signup"), e(2, 1, 1, "purchase", 10.0), e(3, 3, 1, "purchase", 5.0),
        # u2: cohort day0; never returns
        e(4, 0, 2, "signup"),
        # u3: cohort day2; purchase same day ($7, period 0) and day5 ($2, period 3)
        e(5, 2, 3, "signup"), e(6, 2, 3, "purchase", 7.0), e(7, 5, 3, "purchase", 2.0),
        # noise: purchase by a user with no cohort event
        e(8, 1, 9, "purchase", 99.0),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_bounded_daily_retention(spark, events):
    out = retention(events, EventRef("signup"), EventRef("purchase"),
                    WINDOW, TimeIntervalUnit.DAY, max_periods=5)
    got = {(str(r.cohort_bucket), r.period): (r.cohort_size, r.retained)
           for r in out.collect()}
    assert got == {
        ("2024-01-01", 0): (2, 2),   # u1, u2
        ("2024-01-01", 1): (2, 1),   # u1 day1
        ("2024-01-01", 3): (2, 1),   # u1 day3
        ("2024-01-03", 0): (1, 1),   # u3 (same-day purchase is period 0 = cohort row)
        ("2024-01-03", 3): (1, 1),   # u3 day5
    }


def test_unbounded_daily_retention_is_monotone(spark, events):
    out = retention(events, EventRef("signup"), EventRef("purchase"),
                    WINDOW, TimeIntervalUnit.DAY, max_periods=5, unbounded=True)
    got = {(str(r.cohort_bucket), r.period): r.retained for r in out.collect()}
    # u1 max period 3 -> counted at 1,2,3; u2 never; u3 max 3 -> 1,2,3
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1, ("2024-01-01", 2): 1, ("2024-01-01", 3): 1,
        ("2024-01-03", 0): 1,
        ("2024-01-03", 1): 1, ("2024-01-03", 2): 1, ("2024-01-03", 3): 1,
    }
    # monotone non-increasing per cohort
    for cb in ("2024-01-01", "2024-01-03"):
        seq = [got[(cb, p)] for p in range(0, 4) if (cb, p) in got]
        assert seq == sorted(seq, reverse=True)


def test_revenue_cohorts_ltv(spark, events):
    out = revenue_cohorts(events, EventRef("signup"), WINDOW,
                          interval=TimeIntervalUnit.DAY, max_periods=5,
                          revenue_event=EventRef("purchase"))
    got = {(str(r.cohort_bucket), r.period): (r.revenue, r.cum_revenue, r.ltv)
           for r in out.collect()}
    # u9's $99 is excluded (no cohort); u3's same-day $7 is period 0
    assert got == {
        ("2024-01-01", 1): (10.0, 10.0, 5.0),
        ("2024-01-01", 3): (5.0, 15.0, 7.5),
        ("2024-01-03", 0): (7.0, 7.0, 7.0),
        ("2024-01-03", 3): (2.0, 9.0, 9.0),
    }


def test_stickiness_and_histogram(spark, events):
    st = {str(r.bucket): (r.avg_dau, r.period_active, r.stickiness)
          for r in stickiness(events, WINDOW, TimeIntervalUnit.WEEK).collect()}
    # week of Jan 1: days 0(u1,u2,u3... day0 has u1,u2), 1(u1,u9), 2(u3),
    # 3(u1), 5(u3) -> daily actives [2,2,1,1,1] over SEVEN calendar
    # days (two zero days count), weekly actives {1,2,3,9}=4
    assert st["2024-01-01"] == (7 / 7, 4, (7 / 7) / 4)
    hist = {r.active_days: r.n_users
            for r in active_days_histogram(events, WINDOW).collect()}
    # u1: days 0,1,3 = 3; u2: 1; u3: days 2,5 = 2; u9: 1
    assert hist == {3: 1, 1: 2, 2: 1}
