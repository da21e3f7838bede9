"""Segment (cohort) oracle suite."""

from __future__ import annotations

import datetime as dt

from ..dsl import (
    AggFn,
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    PropOp,
    PropertyRef,
    QueryTime,
    Segment,
    SegmentCondition,
    SegQuery,
    TimeIntervalUnit,
)
from ..operators.aggregates import event_segmentation_one
from ..operators.segments import segment_users
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


def _power_purchasers() -> Segment:
    """count(purchase) >= 3 AND sum(purchase.value) > 500."""
    return Segment(
        "power_purchasers",
        conditions=[[
            SegmentCondition(
                "did_event", event=EventRef("purchase"),
                compare_op=PropOp.GTE, right=3, time=_FULL,
            ),
            SegmentCondition(
                "did_event", event=EventRef("purchase"),
                agg=AggFn.SUM, agg_prop=PropertyRef.column("value"),
                compare_op=PropOp.GT, right=500, time=_FULL,
            ),
        ]],
    )


_PP_SQL = f"""
    SELECT user_id FROM events
    WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
    GROUP BY 1 HAVING COUNT(*) >= 3
    INTERSECT
    SELECT user_id FROM events
    WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
    GROUP BY 1 HAVING {S.sum_exact('value')} > 500
"""


@query(
    "segment_has_property_value",
    oracle=f"""
    SELECT DISTINCT user_id FROM events
    WHERE {S.ts_between(*S.T_FULL)}
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 95
    """,
)
def segment_has_property_value(spark, sf_dir):
    """HasPropertyValue cohort: any event with props.k >= 95 in the
    window. Declared in the reference DSL but `unimplemented!` there
    (query/src/event_segmentation.rs:456-545); trivial in Spark."""
    events = load_table(spark, sf_dir, "events")
    seg = Segment(
        "high_k",
        conditions=[[
            SegmentCondition(
                "had_property_value",
                prop=PropertyRef.json("k", "int64"),
                op=PropOp.GTE, values=[95], time=_FULL,
            ),
        ]],
    )
    return segment_users(events, seg)


@query("segment_and_composition", oracle=_PP_SQL)
def segment_and_composition(spark, sf_dir):
    """DidEvent count ∧ DidEvent aggregate-property (reference
    SegmentExpr::And, logical_plan/segment.rs:23-180)."""
    events = load_table(spark, sf_dir, "events")
    return segment_users(events, _power_purchasers())


@query(
    "segment_or_composition",
    oracle=f"""
    SELECT user_id FROM events
    WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'signup'
    GROUP BY 1 HAVING COUNT(*) >= 2
    UNION
    SELECT DISTINCT user_id FROM events
    WHERE {S.ts_between(*S.T_MID)} AND event_type = 'error'
    """,
)
def segment_or_composition(spark, sf_dir):
    """DidEvent ∨ HasPropertyValue — the latter is unimplemented!() in
    the reference (event_segmentation.rs:456-545), native here."""
    seg = Segment(
        "signups_or_erroring",
        conditions=[
            [SegmentCondition("did_event", event=EventRef("signup"),
                              compare_op=PropOp.GTE, right=2, time=_FULL)],
            [SegmentCondition("has_property_value",
                              prop=PropertyRef.column("event_type"),
                              op=PropOp.EQ, values=["error"],
                              time=QueryTime.between(
                                  dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20, 23, 59, 59)))],
        ],
    )
    events = load_table(spark, sf_dir, "events")
    return segment_users(events, seg)


@query(
    "segment_relative_count",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    l AS (
      SELECT user_id, COUNT(*) AS c FROM events
      WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase' GROUP BY 1
    ),
    r AS (
      SELECT user_id, COUNT(*) AS c FROM events
      WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'error' GROUP BY 1
    )
    SELECT u.user_id FROM u
    LEFT JOIN l USING (user_id) LEFT JOIN r USING (user_id)
    WHERE COALESCE(l.c, 0) > COALESCE(r.c, 0)
    """,
)
def segment_relative_count(spark, sf_dir):
    """DidEvent::RelativeCount cohort — users who purchased MORE often
    than they errored (reference common/src/query.rs:350-355, declared
    but `unimplemented!` engine-side; two 0-coalesced per-user counts
    compared here)."""
    events = load_table(spark, sf_dir, "events")
    seg = Segment(
        "more_purchases_than_errors",
        conditions=[[
            SegmentCondition(
                "did_event_relative_count",
                event=EventRef("purchase"),
                relative_event=EventRef("error"),
                compare_op=PropOp.GT, time=_FULL,
            ),
        ]],
    )
    return segment_users(events, seg)


@query(
    "segment_historical_count",
    oracle="""
    SELECT user_id FROM events
    WHERE event_type = 'signup'
    GROUP BY 1 HAVING COUNT(*) >= 15
    """,
)
def segment_historical_count(spark, sf_dir):
    """DidEvent::HistoricalCount cohort — signup count over the user's
    FULL history, ignoring any query window (reference
    common/src/query.rs:365-369, declared but `unimplemented!`
    engine-side). The condition's time is set but deliberately
    ignored, which is the distinguishing semantic."""
    events = load_table(spark, sf_dir, "events")
    seg = Segment(
        "lifetime_frequent_signups",
        conditions=[[
            SegmentCondition(
                "did_event_historical_count",
                event=EventRef("signup"),
                compare_op=PropOp.GTE, right=15,
                time=_FULL,  # ignored by design
            ),
        ]],
    )
    return segment_users(events, seg)


@query(
    "seg_count_daily_segmented",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events
    WHERE {S.ts_between(*S.T_FULL)} AND user_id IN ({_PP_SQL})
    GROUP BY 1
    """,
)
def seg_count_daily_segmented(spark, sf_dir):
    """Event segmentation restricted to a behavioral segment — the
    reference's segment-semi-join plan shape (SegmentedAggregate
    Stage::CollectSegments, SURVEY §2.3)."""
    events = load_table(spark, sf_dir, "events")
    users = segment_users(events, _power_purchasers())
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.DAY, events=[])
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    return event_segmentation_one(events, req, eq, segment_users=users)
