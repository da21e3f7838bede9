"""JSON API layer tests — reference-shaped payloads (modeled on the
reference's own HTTP test client, tests/queries/optiprism.py) parse to
the same requests the DSL builds by hand."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from optiprism_spark.api import parse_event_segmentation, parse_funnel
from optiprism_spark.dsl import (
    AggFn,
    Analysis,
    FunnelCountMode,
    FunnelTouch,
    PropOp,
    StepOrder,
)

_SEG_BODY = {
    "time": {"type": "between", "from": "2024-01-01T00:00:00", "to": "2024-01-31T23:59:59"},
    "group": "user",
    "intervalUnit": "day",
    "chartType": "line",
    "analysis": {"type": "rollingAverage", "window": 3},
    "events": [
        {
            "eventName": "purchase",
            "eventType": "regular",
            "queries": [
                {"type": "countEvents"},
                {"type": "countUniqueGroups", "approx": True},
                {"type": "aggregateProperty", "aggregate": "sum",
                 "propertyType": "event", "propertyName": "value"},
                {"type": "aggregatePropertyPerGroup", "aggregate": "avg",
                 "aggregatePerGroup": "sum", "propertyType": "event",
                 "propertyName": "value"},
                {"type": "formula", "formula": "1 + 1"},
            ],
            "filters": [
                {"type": "property", "propertyType": "event",
                 "propertyName": "k", "operation": "gte", "value": [50]},
            ],
            "breakdowns": [
                {"type": "property", "propertyType": "event", "propertyName": "event_type"},
            ],
        }
    ],
}


def test_parse_event_segmentation():
    req = parse_event_segmentation(_SEG_BODY)
    assert req.interval.value == "day"
    assert req.group_col == "user_id"
    assert req.analysis == Analysis.ROLLING_AVERAGE and req.rolling_window == 3
    (eq,) = req.events
    assert eq.event.name == "purchase"
    kinds = [q.kind for q in eq.queries]
    assert kinds == ["count_events", "count_unique_groups",
                     "aggregate_property", "aggregate_property_per_group",
                     "formula"]
    assert eq.queries[1].approx is True  # rollup-routable uniques
    assert eq.queries[0].approx is False
    assert eq.queries[2].agg == AggFn.SUM
    assert eq.queries[3].inner_agg == AggFn.SUM and eq.queries[3].agg == AggFn.AVG
    # value is a physical column; k resolves into the props JSON
    assert eq.queries[2].prop.kind.value == "column"
    (flt,) = eq.filters
    assert flt.prop.kind.value == "json" and flt.op == PropOp.GTE
    (bd,) = eq.breakdowns
    assert bd.name == "event_type" and bd.kind.value == "column"
    assert req.time.range() == (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


_FUNNEL_BODY = {
    "time": {"type": "between", "from": "2024-01-01T00:00:00", "to": "2024-01-31T23:59:59"},
    "group": "user",
    "steps": [
        {"events": [{"eventName": "signup", "eventType": "regular"}], "order": {"type": "exact"}},
        {"events": [{"eventName": "view", "eventType": "regular"},
                     {"eventName": "click", "eventType": "regular"}],
         "order": {"type": "any", "steps": [[1, 2]]}},
        {"events": [{"eventName": "purchase", "eventType": "regular"}], "order": {"type": "exact"}},
    ],
    "timeWindow": {"n": 7, "unit": "day"},
    "chartType": "line",
    "count": "nonUnique",
    "filter": {"type": "timeToConvert", "from": 0, "to": 3600000},
    "touch": {"type": "step", "step": 1},
    "holdingConstants": [
        {"propertyType": "event", "propertyName": "value"},
    ],
    "exclude": [
        {"eventName": "error", "eventType": "regular",
         "steps": {"type": "between", "from": 2, "to": 3}},
    ],
}


def test_parse_funnel():
    req = parse_funnel(_FUNNEL_BODY)
    assert len(req.steps) == 3
    assert req.steps[1].order == StepOrder.ANY
    assert req.steps[1].any_ranges == ((1, 2),)
    assert req.window_ms == 7 * 86_400_000
    assert req.count_mode == FunnelCountMode.NON_UNIQUE
    assert req.filter.kind == "time_to_convert" and req.filter.max_ms == 3600000
    assert req.touch == FunnelTouch.STEP and req.touch_step == 1
    (c,) = req.constants
    assert c.name == "value"
    (ex,) = req.excludes
    assert ex.event.event.name == "error"
    assert ex.between_steps == (1, 2)  # JSON is 1-based, internal 0-based


def test_parse_edge_validation():
    import datetime as dtm

    import pytest

    from optiprism_spark.api import _ts

    # offset-carrying bounds normalize to UTC, never silently shift
    assert _ts("2024-01-01T12:00:00+05:00") == dtm.datetime(2024, 1, 1, 7, 0, 0)
    assert _ts("2024-01-01T12:00:00Z") == dtm.datetime(2024, 1, 1, 12, 0, 0)
    # unknown group must error, not silently aggregate per user
    bad_group = dict(_SEG_BODY, group=3)
    with pytest.raises(ValueError, match="unknown group"):
        parse_event_segmentation(bad_group)
    # sub-hour windows are valid (reference TimeIntervalUnitSession
    # includes minute/second); a genuinely unknown unit still errors
    assert parse_funnel(dict(
        _FUNNEL_BODY, timeWindow={"n": 30, "unit": "minute"}
    )).window_ms == 30 * 60_000
    bad_window = dict(_FUNNEL_BODY, timeWindow={"n": 3, "unit": "fortnight"})
    with pytest.raises(ValueError, match="timeWindow unit"):
        parse_funnel(bad_window)


def test_parse_custom_event_and_groups():
    import pytest

    from optiprism_spark.api import parse_event_ref, parse_event_segmentation

    catalog = {
        "engagement": [
            {"eventName": "view", "eventType": "regular"},
            {"eventName": "click", "eventType": "regular",
             "filters": [{"type": "property", "propertyType": "event",
                          "propertyName": "k", "operation": "gte", "value": [10]}]},
        ]
    }
    ref = parse_event_ref(
        {"eventType": "custom", "eventName": "engagement"}, custom_events=catalog
    )
    assert ref.custom is not None and len(ref.custom) == 2
    assert ref.custom[0].event.name == "view"
    assert ref.custom[1].filters[0].prop.name == "k"
    # unknown custom event errors instead of silently matching nothing
    with pytest.raises(ValueError, match="unknown custom event"):
        parse_event_ref({"eventType": "custom", "eventId": 99}, custom_events=catalog)
    # non-user group entities resolve through GROUP_COLS
    body = dict(_SEG_BODY, group=1)
    assert parse_event_segmentation(body).group_col == "org_id"
    body = dict(_SEG_BODY, group="org")
    assert parse_event_segmentation(body).group_col == "org_id"


def test_formula_only_query_is_rejected(spark):
    import pytest

    from optiprism_spark.dsl import (
        EventQuery,
        EventRef,
        EventSegmentationRequest,
        QueryTime,
        SegQuery,
        TimeIntervalUnit,
    )
    from optiprism_spark.operators.aggregates import event_segmentation_one
    from optiprism_spark.schema import load_table

    import datetime as dtm

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    req = EventSegmentationRequest(
        time=QueryTime.between(dtm.datetime(2024, 1, 1), dtm.datetime(2024, 1, 2)),
        interval=TimeIntervalUnit.DAY, events=[],
    )
    eq = EventQuery(EventRef(), [SegQuery("formula", formula="1+1")])
    with pytest.raises(ValueError, match="formula"):
        event_segmentation_one(events, req, eq)


def test_json_request_runs_end_to_end(spark):
    from optiprism_spark.queries.event_segmentation import run_event_segmentation
    from optiprism_spark.schema import load_table

    body = {
        "time": _SEG_BODY["time"],
        "group": "user",
        "intervalUnit": "day",
        "chartType": "line",
        "analysis": {"type": "linear"},
        "events": [{
            "eventName": "purchase", "eventType": "regular",
            "queries": [{"type": "countEvents"}],
        }],
    }
    req = parse_event_segmentation(body)
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = run_event_segmentation(events, req)
    n = (
        events.filter("event_type = 'purchase'")
        .filter("ts >= '2024-01-01' and ts <= '2024-01-31 23:59:59'")
        .count()
    )
    total = sum(r[1] for r in out.collect())
    assert total == n


def test_funnel_json_runs_end_to_end(spark):
    from optiprism_spark.operators.funnel import funnel_report
    from optiprism_spark.schema import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    rep = funnel_report(events, parse_funnel(_FUNNEL_BODY))
    assert rep.count() >= 0  # full pipeline executes
    assert "step2_conversion_ratio" in rep.columns


def test_float_json_prop_aggregates_without_truncation(spark):
    """A float-valued JSON property summed via aggregateProperty with
    no dtype in the payload must keep its fractional part — the dtype
    fallback in aggregation context is decimal, not int64."""
    from optiprism_spark.queries.event_segmentation import run_event_segmentation

    events = spark.createDataFrame(
        [
            (1, 10, "purchase", "2024-01-01 10:00:00", '{"price": 1.5}'),
            (2, 10, "purchase", "2024-01-01 11:00:00", '{"price": 2.25}'),
        ],
        "event_id long, user_id long, event_type string, ts string, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00",
                 "to": "2024-01-02T00:00:00"},
        "group": "user",
        "intervalUnit": "day",
        "chartType": "line",
        "analysis": {"type": "linear"},
        "events": [{
            "eventName": "purchase", "eventType": "regular",
            "queries": [{"type": "aggregateProperty", "aggregate": "sum",
                         "propertyType": "event", "propertyName": "price"}],
        }],
    }
    out = run_event_segmentation(events, parse_event_segmentation(body)).collect()
    assert len(out) == 1
    assert float(out[0][1]) == 3.75  # int64 fallback would give 3.0
