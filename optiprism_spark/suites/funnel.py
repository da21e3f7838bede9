"""Funnel oracle suite.

Two operators over the driver events table (signup → view → purchase):

- ``funnel_first_touch_3step``: declarative first-touch funnel with an
  exact DuckDB oracle (chained min-timestamp joins).
- ``funnel_machine_*``: the reference-exact greedy state machine —
  NOT SQL-expressible (greedy restart, excludes, constants), so the
  driver records a rows-only check; its semantics are pinned by the
  scripted-trace tests in tests/test_funnel.py instead (the same
  split the reference uses: ClickHouse oracle for aggregates,
  scripted traces for the funnel, SURVEY §5).
"""

from __future__ import annotations

import datetime as dt

from ..dsl import (
    EventFilterSpec,
    EventRef,
    FunnelCountMode,
    FunnelExclude,
    FunnelFilter,
    FunnelRequest,
    FunnelStep,
    FunnelTouch,
    PropertyRef,
    QueryTime,
    StepOrder,
    TimeIntervalUnit,
)
from ..operators.funnel import funnel_report
from ..operators.funnel_df import funnel_first_touch_report
from ..registry import query
from ..schema import load_table
from . import _sql as S

_WINDOW_MS = 7 * 86400 * 1000

def _req(**kw):
    defaults = dict(
        time=QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59)),
        interval=TimeIntervalUnit.DAY,
        steps=[
            FunnelStep([EventFilterSpec(EventRef("signup"))]),
            FunnelStep([EventFilterSpec(EventRef("view"))]),
            FunnelStep([EventFilterSpec(EventRef("purchase"))]),
        ],
        window_ms=_WINDOW_MS,
    )
    defaults.update(kw)
    return FunnelRequest(**defaults)


@query(
    "funnel_first_touch_3step",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_type FROM events WHERE {S.ts_between(*S.T_FULL)}
    ),
    s0 AS (SELECT user_id, MIN(ts) AS t0 FROM e WHERE event_type = 'signup' GROUP BY 1),
    s1 AS (
      SELECT s0.user_id, MIN(e.ts) AS t1
      FROM s0 JOIN e ON e.user_id = s0.user_id AND e.event_type = 'view'
        AND e.ts > s0.t0 AND e.ts <= s0.t0 + INTERVAL 7 DAY
      GROUP BY 1
    ),
    s2 AS (
      SELECT s1.user_id, MIN(e.ts) AS t2
      FROM s1
      JOIN s0 ON s0.user_id = s1.user_id
      JOIN e ON e.user_id = s1.user_id AND e.event_type = 'purchase'
        AND e.ts > s1.t1 AND e.ts <= s0.t0 + INTERVAL 7 DAY
      GROUP BY 1
    ),
    u AS (
      SELECT s0.user_id, t0, t1, t2
      FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    )
    SELECT CAST(date_trunc('day', t0) AS DATE) AS bucket,
           COUNT(*) AS step0_total,
           COUNT(t1) AS step1_total,
           COUNT(t2) AS step2_total,
           CAST(COUNT(t2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 100 AS conversion_ratio,
           CASE WHEN COUNT(t2) > 0 THEN
             (CAST(SUM(CASE WHEN t2 IS NOT NULL
                            THEN date_diff('microsecond', t0, t2) END) AS DOUBLE) / 1e6)
             / CAST(COUNT(t2) AS DOUBLE)
           END AS avg_secs_to_convert
    FROM u GROUP BY 1
    """,
)
def funnel_first_touch_3step(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return funnel_first_touch_report(events, _req())


@query("funnel_machine_3step")  # greedy machine: rows-only (non-SQL-expressible)
def funnel_machine_3step(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req())


@query("funnel_machine_nonunique")  # rows-only
def funnel_machine_nonunique(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(count_mode=FunnelCountMode.NON_UNIQUE))


@query("funnel_machine_excludes")  # rows-only
def funnel_machine_excludes(spark, sf_dir):
    """Excludes: an `error` event between any steps resets the attempt
    without recording it (reference funnel.rs:544-556)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(
        events,
        _req(excludes=[FunnelExclude(EventFilterSpec(EventRef("error")))]),
    )


@query("funnel_machine_dropoff_step1")  # rows-only
def funnel_machine_dropoff_step1(spark, sf_dir):
    """Drop-off filter: only attempts that stalled exactly after the
    `view` step count as completed=true (reference
    FunnelFilter::DropOffOnStep, mod.rs:69-76)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(filter=FunnelFilter("drop_off_on_step", step=1)))


@query("funnel_machine_constants")  # rows-only
def funnel_machine_constants(spark, sf_dir):
    """Holding constant: the `k` JSON property must keep one value
    across all steps of an attempt (reference Group::check_constants,
    funnel.rs:167-178)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(constants=[PropertyRef.json("k", "int64")]))


@query("funnel_machine_any_order_touch_last")  # rows-only
def funnel_machine_any_order_touch_last(spark, sf_dir):
    """Any-order middle steps + last-touch bucket attribution
    (reference StepOrder::Any + Touch::Last)."""
    events = load_table(spark, sf_dir, "events")
    any_steps = [
        FunnelStep([EventFilterSpec(EventRef("signup"))]),
        FunnelStep(
            [EventFilterSpec(EventRef("view")), EventFilterSpec(EventRef("click"))],
            order=StepOrder.ANY, any_ranges=[(1, 2)],
        ),
        FunnelStep(
            [EventFilterSpec(EventRef("view")), EventFilterSpec(EventRef("click"))],
            order=StepOrder.ANY, any_ranges=[(1, 2)],
        ),
    ]
    return funnel_report(events, _req(steps=any_steps, touch=FunnelTouch.LAST))


@query("funnel_machine_session_mode")  # rows-only
def funnel_machine_session_mode(spark, sf_dir):
    """Session count mode: the state machine runs per (user, 30-min
    session) — declared in the reference DSL but `unimplemented!`
    there (common/src/funnel.rs:60-70); implemented here."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(count_mode=FunnelCountMode.SESSION))
