"""Whale guard on the declarative first-touch funnel
(operators/funnel_df.py): the single-pass aggregate buffers one
collect_list of step-i timestamps per user, so a bot user's list is
unbounded without the pre-shuffle cap (r16 verdict item 2 /
ADVICE funnel_df.py:78). The guard must (a) bound the rows feeding
the aggregate exactly like `whale.cap_rows_per_key` (first `cap` rows
per user by (ts, event_id)), (b) leave under-cap users untouched, and
(c) default OFF with results identical to the unguarded operator —
the oracle-checked configuration."""

from __future__ import annotations

import datetime as dt

from optiprism_spark.dsl import (
    EventFilterSpec,
    EventRef,
    FunnelRequest,
    FunnelStep,
    QueryTime,
    TimeIntervalUnit,
)
from optiprism_spark.operators.funnel_df import (
    funnel_first_touch_report,
    funnel_first_touch_users,
)

T0 = dt.datetime(2024, 1, 1, 11, 0, 0)
_TIME = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))


def mk_events(spark, rows):
    """rows: (user, minutes_after_T0, event)"""
    data = [
        (i, T0 + dt.timedelta(minutes=m), int(u), e, 1.0, "{}")
        for i, (u, m, e) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def req3(window_min=60):
    return FunnelRequest(
        time=_TIME,
        interval=TimeIntervalUnit.DAY,
        steps=[FunnelStep([EventFilterSpec(EventRef(n))])
               for n in ("e1", "e2", "e3")],
        window_ms=window_min * 60 * 1000,
    )


#: whale user 1: step-0 entry, then a burst of step-1 events, with the
#: step-2 conversion LAST — a cap of 3 keeps (e1@0, e2@1, e2@2) and
#: cuts the e3@9 conversion; user 2 is a normal 3-row full conversion.
ROWS = (
    [(1, 0, "e1")]
    + [(1, 1 + i, "e2") for i in range(8)]
    + [(1, 9, "e3")]
    + [(2, 0, "e1"), (2, 1, "e2"), (2, 2, "e3")]
)


def _users(df):
    return {
        r.user_id: (r.t_0, r.t_1, r.t_2)
        for r in df.select("user_id", "t_0", "t_1", "t_2").collect()
    }


def test_guard_caps_whale_rows_before_aggregate(spark):
    events = mk_events(spark, ROWS)
    got = _users(funnel_first_touch_users(events, req3(),
                                          max_rows_per_user=3))
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    # whale truncated to its first 3 rows: converts step1, not step2
    assert got[1] == (t(0), t(1), None)
    # under-cap user untouched: full conversion
    assert got[2] == (t(0), t(1), t(2))


def test_guard_default_off_is_exact(spark):
    events = mk_events(spark, ROWS)
    plain = _users(funnel_first_touch_users(events, req3()))
    explicit = _users(funnel_first_touch_users(events, req3(),
                                               max_rows_per_user=None))
    assert plain == explicit
    t = lambda m: T0 + dt.timedelta(minutes=m)  # noqa: E731
    assert plain[1] == (t(0), t(1), t(9))


def test_guard_off_plan_shape_unchanged(spark):
    """The guard must be free when disabled: no residual cutoff
    join/window in the plan, same exchange count (exprIds differ per
    construction, so compare structure, not strings)."""
    events = mk_events(spark, ROWS)

    def shape(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return (p.count("Exchange"), p.count("Window"), p.count("Join"))

    off = shape(funnel_first_touch_users(events, req3()))
    none = shape(funnel_first_touch_users(events, req3(),
                                          max_rows_per_user=None))
    on = shape(funnel_first_touch_users(events, req3(),
                                        max_rows_per_user=3))
    assert off == none
    assert off[1] == 0 and off[2] == 0  # no window, no join unguarded
    assert on[1] > 0 and on[2] > 0      # the guard is really wired in


def test_report_passes_guard_through(spark):
    events = mk_events(spark, ROWS)
    rep = funnel_first_touch_report(events, req3(), max_rows_per_user=3)
    row = rep.collect()[0]
    # both users enter step0; both reach step1; only user 2 converts
    assert (row.step0_total, row.step1_total, row.step2_total) == (2, 2, 1)
