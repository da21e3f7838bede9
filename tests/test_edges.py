"""Edge-case hardening: empty inputs, degenerate documents, single-step
funnels — operators must return empty/valid frames, never throw."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from optiprism_spark.dsl import (
    EventFilterSpec,
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    FunnelRequest,
    FunnelStep,
    QueryTime,
    SegQuery,
    TimeIntervalUnit,
)
from optiprism_spark.operators.aggregates import event_segmentation_one
from optiprism_spark.operators.dedup import exact_dedup, jaccard_pairs, minhash_signatures
from optiprism_spark.operators.funnel import funnel_attempts, funnel_report
from optiprism_spark.operators.text import text_stats

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)
_TIME = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))
_TIME2D = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3))


def _events(spark, rows):
    return spark.createDataFrame(rows, _EVENTS_SCHEMA)


def test_funnel_single_step(spark):
    rows = [(0, dt.datetime(2024, 1, 1, 10), 1, "e1", 1.0, "{}")]
    req = FunnelRequest(
        time=_TIME, interval=TimeIntervalUnit.DAY,
        steps=[FunnelStep([EventFilterSpec(EventRef("e1"))])],
        window_ms=60_000,
    )
    out = funnel_attempts(_events(spark, rows), req).collect()
    assert [(r.steps_completed, r.is_completed) for r in out] == [(1, True)]
    rep = funnel_report(_events(spark, rows), req).collect()
    assert rep[0].total == 1 and rep[0].completed == 1


def test_funnel_no_matching_events_is_empty_not_error(spark):
    rows = [(0, dt.datetime(2024, 1, 1, 10), 1, "other", 1.0, "{}")]
    req = FunnelRequest(
        time=_TIME, interval=TimeIntervalUnit.DAY,
        steps=[
            FunnelStep([EventFilterSpec(EventRef("e1"))]),
            FunnelStep([EventFilterSpec(EventRef("e2"))]),
        ],
        window_ms=60_000,
    )
    assert funnel_report(_events(spark, rows), req).count() == 0


def test_segmentation_empty_time_range(spark):
    rows = [(0, dt.datetime(2025, 6, 1), 1, "view", 1.0, "{}")]  # outside range
    req = EventSegmentationRequest(time=_TIME, interval=TimeIntervalUnit.DAY, events=[])
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    out = event_segmentation_one(_events(spark, rows), req, eq)
    assert out.count() == 0
    assert out.columns == ["bucket", "n"]


def test_text_stats_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "word"), (3, "a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in text_stats(docs).collect()}
    assert rows[1].n_chars == 0
    assert rows[2].n_tokens == 1 and rows[2].mean_word_len == 4.0
    # shingle window larger than the doc: one (short) shingle, no crash
    assert rows[3].fingerprint is not None


def test_dedup_single_and_empty(spark):
    one = spark.createDataFrame([(1, "only doc")], "doc_id long, text string")
    assert exact_dedup(one).count() == 1
    assert jaccard_pairs(one, threshold=0.0, candidates="all").count() == 0  # no pairs
    assert minhash_signatures(one, k=2).columns == ["doc_id", "sig_0", "sig_1"]
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert funnel_like_empty_ok(minhash_signatures(empty, k=2))


def funnel_like_empty_ok(df) -> bool:
    return df.count() == 0


# ------------------------------------------- round-6 review regressions

def test_mixed_levels_merge_null_breakdown_groups(spark):
    """A NULL breakdown value (missing JSON key) is ONE group: the
    single-level and two-level metric frames must merge on it
    null-safely instead of splitting into two half-empty rows."""
    from optiprism_spark.dsl import PropertyRef, SegQuery
    from optiprism_spark.dsl import AggFn

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "buy", 5.0, '{"seg": "a"}'),
        (2, dt.datetime(2024, 1, 1, 11), 1, "buy", 7.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 12), 2, "buy", 9.0, "{}"),
    ]
    req = EventSegmentationRequest(
        time=_TIME, interval=TimeIntervalUnit.DAY,
        events=[EventQuery(EventRef("buy"), queries=[
            SegQuery("count_events", alias="n"),
            SegQuery("count_per_group", agg=AggFn.AVG, alias="avg_per_user"),
        ])],
        breakdowns=[PropertyRef.json("seg")],
    )
    out = event_segmentation_one(_events(spark, rows), req, req.events[0])
    got = {r["seg"]: (r["n"], r["avg_per_user"]) for r in out.collect()}
    assert out.count() == 2, out.collect()
    # null group: 2 events over users {1: 1 event, 2: 1 event} -> avg 1
    assert got[None] == (2, 1.0)
    assert got["a"] == (1, 1.0)


def test_custom_event_with_match_all_member(spark):
    """A custom event containing one unrestricted member (EventRef()
    with no name) matches EVERY event — multi_or must not narrow it to
    the named members."""
    from optiprism_spark.dsl import SegQuery

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "buy", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 11), 1, "view", 1.0, "{}"),
    ]
    custom = EventRef(custom=[
        EventFilterSpec(EventRef()),          # all events
        EventFilterSpec(EventRef("buy")),
    ])
    req = EventSegmentationRequest(
        time=_TIME, interval=TimeIntervalUnit.DAY,
        events=[EventQuery(custom, queries=[SegQuery("count_events", alias="n")])],
    )
    out = event_segmentation_one(_events(spark, rows), req, req.events[0])
    assert [r["n"] for r in out.collect()] == [2]


def test_empty_values_filter_ops_raise(spark):
    from optiprism_spark.dsl import PropFilter, PropOp, PropertyRef
    from optiprism_spark.exprs import property_expression

    import pytest

    for op in (PropOp.GT, PropOp.LIKE, PropOp.NOT_LIKE, PropOp.REGEX,
               PropOp.NOT_REGEX):
        with pytest.raises(ValueError, match="at least one value"):
            property_expression(PropFilter(PropertyRef.column("value"), op, ()))


def test_ts_lit_converts_aware_datetimes_to_utc(spark):
    """A timezone-aware bound must shift to UTC, not silently drop its
    offset (which would move the query range by the offset)."""
    from optiprism_spark.exprs import _ts_lit

    aware = dt.datetime(2024, 1, 1, 5, 0, 0,
                        tzinfo=dt.timezone(dt.timedelta(hours=5)))
    naive_utc = dt.datetime(2024, 1, 1, 0, 0, 0)
    row = spark.range(1).select(
        _ts_lit(aware).alias("a"), _ts_lit(naive_utc).alias("b")).collect()[0]
    assert row.a == row.b


def test_segment_without_conditions_raises(spark):
    from optiprism_spark.dsl import Segment
    from optiprism_spark.operators.segments import segment_users

    import pytest

    ev = _events(spark, [(1, dt.datetime(2024, 1, 1, 10), 1, "buy", 1.0, "{}")])
    with pytest.raises(ValueError, match="condition"):
        segment_users(ev, Segment("empty"))
    with pytest.raises(ValueError, match="condition"):
        segment_users(ev, Segment("empty-and", conditions=[[]]))


def test_relative_count_gt_skips_universe_scan_and_is_correct(spark):
    """GT can never admit a 0-vs-0 user, so the full distinct-user
    universe scan is skipped — and users on neither count side stay
    excluded while one-sided users still compare against 0."""
    from optiprism_spark.dsl import Segment, SegmentCondition, PropOp
    from optiprism_spark.operators.segments import condition_users

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "buy", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 11), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 12), 2, "buy", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 13), 3, "refund", 1.0, "{}"),
    ]
    ev = _events(spark, rows)
    cond = SegmentCondition(
        kind="did_event_relative_count", time=_TIME,
        event=EventRef("buy"), relative_event=EventRef("view"),
        compare_op=PropOp.GT,
    )
    got = {r.user_id for r in condition_users(ev, cond).collect()}
    # user 1: buy=1 view=1 -> not >; user 2: buy=1 view=0 -> qualifies;
    # user 3: 0 vs 0 -> must NOT qualify (and needs no universe scan)
    assert got == {2}
    plan = condition_users(ev, cond)._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    # EQ variant: 0-vs-0 qualifies, so user 3 appears via the universe
    cond_eq = SegmentCondition(
        kind="did_event_relative_count", time=_TIME,
        event=EventRef("buy"), relative_event=EventRef("view"),
        compare_op=PropOp.EQ,
    )
    got_eq = {r.user_id for r in condition_users(ev, cond_eq).collect()}
    assert got_eq == {1, 3}


def test_json_property_with_dotted_name(spark):
    """A flat JSON key literally containing a dot must resolve via the
    bracket-quoted JSONPath, not be read as a nested path."""
    from optiprism_spark.dsl import PropertyRef, SegQuery

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "buy", 1.0,
         '{"utm.source": "ads", "utm": {"source": "nested"}}'),
    ]
    req = EventSegmentationRequest(
        time=_TIME, interval=TimeIntervalUnit.DAY,
        events=[EventQuery(EventRef("buy"),
                           queries=[SegQuery("count_events", alias="n")])],
        breakdowns=[PropertyRef.json("utm.source")],
    )
    out = event_segmentation_one(_events(spark, rows), req, req.events[0])
    assert [r["utm.source"] for r in out.collect()] == ["ads"]


def test_compare_previous_honors_unit_and_gaps(spark):
    """compare {offset: 1, unit: week} over day buckets must reach 7
    calendar days back — and a zero-event gap must yield NO prev value
    rather than silently comparing against the last present row."""
    from optiprism_spark.operators.windows import compare_previous

    rows = [
        (dt.date(2024, 1, 1), 10.0),
        (dt.date(2024, 1, 8), 30.0),   # exactly 1 week after day 1
        (dt.date(2024, 1, 9), 40.0),   # 1 week after a MISSING day 2
    ]
    df = spark.createDataFrame(rows, "bucket date, n double")
    out = {r.bucket: r.n_prev for r in compare_previous(
        df, ["n"], offset=1, unit="week", interval="day").collect()}
    assert out[dt.date(2024, 1, 8)] == 10.0
    assert out[dt.date(2024, 1, 9)] is None  # day 2 had no bucket
    assert out[dt.date(2024, 1, 1)] is None


def test_rolling_average_skips_gap_buckets(spark):
    """A 2-bucket trailing mean over a gappy daily series must only
    look 1 calendar day back: with day 2 missing, day 3's window is
    just day 3 — a ROWS frame would wrongly pull in day 1."""
    from optiprism_spark.operators.windows import rolling_average

    rows = [(dt.date(2024, 1, 1), 10.0), (dt.date(2024, 1, 3), 30.0)]
    df = spark.createDataFrame(rows, "bucket date, n double")
    out = {r.bucket: r.n for r in rolling_average(
        df, ["n"], window=2, interval="day").collect()}
    assert out[dt.date(2024, 1, 3)] == 30.0  # NOT (10+30)/2


def test_last_n_years_from_leap_day():
    from optiprism_spark.dsl import QueryTime, TimeIntervalUnit

    qt = QueryTime.last(1, TimeIntervalUnit.YEAR,
                        now=dt.datetime(2028, 2, 29, 12, 0))
    start, end = qt.range()
    assert start == dt.datetime(2027, 2, 28, 12, 0)


def test_rename_column_rows_empty_mapping_is_noop(spark):
    from optiprism_spark.operators.reshape import rename_column_rows

    df = spark.createDataFrame([("a",)], "x string")
    assert rename_column_rows(df, "x", {}).collect() == df.collect()


def test_group_records_search_dedups_by_entity(spark):
    """Searching group 1 (org) must return one latest profile per ORG,
    not one per user — and sorting by a JSON property must resolve via
    props instead of crashing on an unresolved column."""
    from optiprism_spark.operators.records import group_records_search

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, 100, "profile", '{"plan": "b"}'),
        (2, dt.datetime(2024, 1, 1, 11), 2, 100, "profile", '{"plan": "a"}'),
        (3, dt.datetime(2024, 1, 1, 12), 3, 200, "profile", '{"plan": "c"}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, org_id long,"
        " event_type string, props string")
    got = group_records_search(df, sort_prop="plan", user_col="org_id").collect()
    # org 100's latest profile is user 2's row (plan a), org 200 -> c
    assert [(r.org_id, r.user_id) for r in got] == [(100, 2), (200, 3)]


def test_funnel_sub_hour_window_and_null_event_id():
    from optiprism_spark import api

    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00Z",
                 "to": "2024-01-02T00:00:00Z"},
        "group": "user",
        "chartType": {"type": "steps", "intervalUnit": "day"},
        "timeWindow": {"n": 90, "unit": "second"},
        "steps": [
            {"events": [{"eventType": "regular", "eventId": None,
                         "eventName": "view"}]},
            {"events": [{"eventType": "regular", "eventName": "buy"}]},
        ],
    }
    req = api.parse_funnel(body)
    assert req.window_ms == 90_000
    assert req.steps[0].events[0].event.name == "view"



def test_segments_flow_from_request_body(spark):
    """req.segments (the reference DSL body "segments") must produce
    per-segment series — previously parsed nowhere and silently
    ignored."""
    import datetime as dtm

    from optiprism_spark import api
    from optiprism_spark.queries.event_segmentation import (
        run_event_segmentation,
    )

    rows = [
        (1, dtm.datetime(2024, 1, 1, 10), 1, "buy", 1.0, "{}"),
        (2, dtm.datetime(2024, 1, 1, 11), 1, "view", 1.0, "{}"),
        (3, dtm.datetime(2024, 1, 1, 12), 2, "buy", 1.0, "{}"),
    ]
    ev = _events(spark, rows)
    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00Z",
                 "to": "2024-01-02T00:00:00Z"},
        "group": "user",
        "intervalUnit": "day",
        "events": [{"eventName": "buy", "eventType": "regular",
                    "queries": [{"type": "countEvents"}]}],
        "segments": [{
            "name": "viewers",
            "conditions": [[{"DidEvent": {
                "event": {"eventName": "view", "eventType": "regular"},
                "aggregate": {"Count": {"operation": "gte", "value": 1}},
            }}]],
        }],
    }
    req = api.parse_event_segmentation(body)
    assert len(req.segments) == 1 and req.segments[0].name == "viewers"
    out = run_event_segmentation(ev, req, fmt="compact").collect()
    # only user 1 viewed; the viewers segment counts their single buy
    assert [(r["segment"], int(r[2])) for r in out] == [("viewers", 1)]


def test_chart_format_applies_analysis(spark):
    """Cumulative analysis must transform the CHART format too — it
    previously applied only on the compact path."""
    import datetime as dtm

    from optiprism_spark.dsl import Analysis, SegQuery
    from optiprism_spark.queries.event_segmentation import (
        run_event_segmentation,
    )

    rows = [
        (1, dtm.datetime(2024, 1, 1, 10), 1, "buy", 1.0, "{}"),
        (2, dtm.datetime(2024, 1, 2, 10), 1, "buy", 1.0, "{}"),
    ]
    req = EventSegmentationRequest(
        time=_TIME2D, interval=TimeIntervalUnit.DAY,
        events=[EventQuery(EventRef("buy"),
                           queries=[SegQuery("count_events", alias="n")])],
        analysis=Analysis.CUMULATIVE,
    )
    out = run_event_segmentation(_events(spark, rows), req, fmt="chart")
    row = out.collect()[0]
    # day-2 column must hold the running sum (2), not the linear 1
    assert int(row["2024-01-02"]) == 2
