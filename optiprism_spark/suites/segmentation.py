"""Event-segmentation oracle suite — the aggregate matrix.

Mirrors the reference's differential test sweep (tests/queries/
test_aggregate.py / test_partitioned_aggregate.py vs ClickHouse,
SURVEY §5): every aggregate kind × bucketing interval × filter shape,
run through the engine's DataFrame builder and checked against DuckDB.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ..dsl import (
    AggFn,
    EventFilterSpec,
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    PropFilter,
    PropOp,
    PropertyRef,
    QueryTime,
    SegQuery,
    TimeIntervalUnit,
)
from ..operators.aggregates import DECIMAL_T, event_segmentation_one
from ..operators.reshape import merge_frames
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))
_MID = QueryTime.between(dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20, 23, 59, 59))


def _seg(spark, sf_dir, req, eq, **kw):
    return event_segmentation_one(load_table(spark, sf_dir, "events"), req, eq, **kw)


# ------------------------------------------------------------------ CountEvents

@query(
    "seg_count_daily_by_type",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, event_type, COUNT(*) AS n
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1, 2
    """,
)
def seg_count_daily_by_type(spark, sf_dir):
    """CountEvents per day, breakdown by event name (reference
    Query::CountEvents, common/src/event_segmentation.rs:57-77)."""
    req = EventSegmentationRequest(
        time=_FULL,
        interval=TimeIntervalUnit.DAY,
        events=[],
        breakdowns=[PropertyRef.column("event_type")],
    )
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_count_hourly_purchase",
    oracle=f"""
    SELECT {S.bucket('hour')} AS bucket, COUNT(*) AS n
    FROM events WHERE {S.ts_between(*S.T_MID)} AND event_type = 'purchase'
    GROUP BY 1
    """,
)
def seg_count_hourly_purchase(spark, sf_dir):
    req = EventSegmentationRequest(time=_MID, interval=TimeIntervalUnit.HOUR, events=[])
    eq = EventQuery(EventRef("purchase"), [SegQuery("count_events", alias="n")])
    return _seg(spark, sf_dir, req, eq)


# ----------------------------------------------------- int-typed property aggs

@query(
    "seg_agg_int_prop",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           median(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS med_k
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_agg_int_prop(spark, sf_dir):
    """Aggregate sweep over an INTEGER-typed property (the reference's
    ClickHouse suite sweeps every agg × numeric type; the driver events
    table's only int-valued property lives in the props JSON). Integer
    SUM stays exact without the decimal detour."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.DAY, events=[])
    k = PropertyRef.json("k", "int64")
    eq = EventQuery(
        EventRef(),
        [
            SegQuery("aggregate_property", agg=AggFn.SUM, prop=k, alias="sum_k"),
            SegQuery("aggregate_property", agg=AggFn.MIN, prop=k, alias="min_k"),
            SegQuery("aggregate_property", agg=AggFn.MAX, prop=k, alias="max_k"),
            SegQuery("aggregate_property", agg=AggFn.MEDIAN, prop=k, alias="med_k"),
        ],
    )
    return _seg(spark, sf_dir, req, eq)


# ----------------------------------------------------- inner×outer agg matrix

@query(
    "seg_agg_matrix_per_user",
    oracle=f"""
    WITH per_user AS (
      SELECT {S.bucket('week')} AS bucket, user_id,
             SUM(CAST(value AS {S.DECIMAL_T})) AS s,
             MIN(value) AS mn, MAX(value) AS mx, COUNT(value) AS c
      FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT bucket,
           (CAST(SUM(s) AS DOUBLE) / COUNT(s)) AS avg_sum_value,
           MAX(mn) AS max_min_value,
           MIN(mx) AS min_max_value,
           CAST(SUM(c) AS DOUBLE) AS sum_count
    FROM per_user GROUP BY 1
    """,
)
def seg_agg_matrix_per_user(spark, sf_dir):
    """Inner×outer aggregate matrix in one request — avg(sum), max(min),
    min(max), sum(count) per user — the combination sweep the
    reference's ClickHouse suite exercises (tests/queries/
    test_partitioned_aggregate.py, SURVEY §5)."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.WEEK, events=[])
    v = PropertyRef.column("value")
    eq = EventQuery(
        EventRef("purchase"),
        [
            SegQuery("aggregate_property_per_group", inner_agg=AggFn.SUM,
                     agg=AggFn.AVG, prop=v, alias="avg_sum_value"),
            SegQuery("aggregate_property_per_group", inner_agg=AggFn.MIN,
                     agg=AggFn.MAX, prop=v, alias="max_min_value"),
            SegQuery("aggregate_property_per_group", inner_agg=AggFn.MAX,
                     agg=AggFn.MIN, prop=v, alias="min_max_value"),
            SegQuery("aggregate_property_per_group", inner_agg=AggFn.COUNT,
                     agg=AggFn.SUM, prop=v, alias="sum_count"),
        ],
    )
    return _seg(spark, sf_dir, req, eq)


# ---------------------------------------------------------- time-range kinds

@query(
    "seg_time_last_n_days",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 12:00:00' AND ts <= TIMESTAMP '2024-01-20 12:00:00'
    GROUP BY 1
    """,
)
def seg_time_last_n_days(spark, sf_dir):
    """QueryTime::Last(n, unit) with an injected deterministic `now`
    (reference common/src/query.rs:401-422; the HTTP layer's
    ?timestamp= override)."""
    req = EventSegmentationRequest(
        time=QueryTime.last(10, TimeIntervalUnit.DAY, now=dt.datetime(2024, 1, 20, 12)),
        interval=TimeIntervalUnit.DAY,
        events=[],
    )
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_time_from_minute_buckets",
    oracle="""
    SELECT date_trunc('minute', ts) AS bucket, COUNT(*) AS n
    FROM events WHERE ts >= TIMESTAMP '2024-01-31 20:00:00'
    GROUP BY 1
    """,
)
def seg_time_from_minute_buckets(spark, sf_dir):
    """QueryTime::From (open-ended) with minute-level bucketing —
    closes the interval-unit axis below hour."""
    req = EventSegmentationRequest(
        time=QueryTime.from_(dt.datetime(2024, 1, 31, 20)),
        interval=TimeIntervalUnit.MINUTE,
        events=[],
    )
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_year_buckets",
    oracle=f"""
    SELECT CAST(date_trunc('year', ts) AS DATE) AS bucket,
           COUNT(*) AS n, {S.sum_exact('value')} AS sum_value
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_year_buckets(spark, sf_dir):
    """Year-interval bucketing through the engine entry point — the
    one truncation unit no other query passed through
    event_segmentation_one (reference date_trunc labels,
    common/src/query.rs:484-518). Month-interval runs through the
    engine in seg_mau."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.YEAR, events=[])
    eq = EventQuery(
        EventRef(),
        [
            SegQuery("count_events", alias="n"),
            SegQuery("aggregate_property", agg=AggFn.SUM,
                     prop=PropertyRef.column("value"), alias="sum_value"),
        ],
    )
    return _seg(spark, sf_dir, req, eq)


# ------------------------------------------------------------- group analytics

@query(
    "seg_group_analytics_org",
    oracle=f"""
    WITH e AS (
      SELECT *, user_id % 50 AS org_id FROM events WHERE {S.ts_between(*S.T_FULL)}
    ),
    per_org AS (SELECT {S.bucket('week')} AS bucket, org_id, COUNT(*) AS c FROM e GROUP BY 1, 2)
    SELECT e2.bucket, uniq_orgs, avg_events_per_org FROM (
      SELECT {S.bucket('week')} AS bucket, COUNT(DISTINCT org_id) AS uniq_orgs
      FROM e GROUP BY 1
    ) e2 JOIN (
      SELECT bucket, {S.avg_exact('c')} AS avg_events_per_org FROM per_org GROUP BY 1
    ) p ON e2.bucket = p.bucket
    """,
)
def seg_group_analytics_org(spark, sf_dir):
    """Group analytics on a non-user entity (the reference's
    group_0..group_4 tables, common/src/lib.rs:16-22): the engine's
    `group_col` parameter re-keys every per-group aggregate. The org
    id is synthesized (user_id % 50) since the driver testdata carries
    no group column — the operator path is the real one."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "org_id", F.col("user_id") % 50
    )
    req = EventSegmentationRequest(
        time=_FULL, interval=TimeIntervalUnit.WEEK, events=[], group_col="org_id"
    )
    eq = EventQuery(
        EventRef(),
        [
            SegQuery("count_unique_groups", alias="uniq_orgs"),
            SegQuery("count_per_group", agg=AggFn.AVG, alias="avg_events_per_org"),
        ],
    )
    return event_segmentation_one(events, req, eq)


# ------------------------------------------------------------------ JSON API

@query(
    "api_json_segmentation",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, event_type,
           COUNT(*) AS n, {S.sum_exact('value')} AS sum_value
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1, 2
    """,
)
def api_json_segmentation(spark, sf_dir):
    """A reference-shaped camelCase JSON request body (the reference's
    HTTP DSL, platform/src/event_segmentation.rs) parsed by api.py and
    executed — the migration path for existing reference clients."""
    from ..api import parse_event_segmentation
    from ..queries.event_segmentation import run_event_segmentation

    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00",
                 "to": "2024-01-31T23:59:59"},
        "group": "user",
        "intervalUnit": "day",
        "chartType": "line",
        "analysis": {"type": "linear"},
        "breakdowns": [{"type": "property", "propertyType": "event",
                        "propertyName": "event_type"}],
        "events": [{
            "eventName": None, "eventType": "regular",
            "queries": [
                {"type": "countEvents"},
                {"type": "aggregateProperty", "aggregate": "sum",
                 "propertyType": "event", "propertyName": "value"},
            ],
        }],
    }
    # all-events query: the reference expresses it as one event per
    # tracked name; here a None eventName means no event filter
    body["events"][0]["eventName"] = None
    req = parse_event_segmentation(body)
    events = load_table(spark, sf_dir, "events")
    df = run_event_segmentation(events, req)
    return df.select(
        F.col("bucket"), F.col("event_type"),
        F.col("0_0_count_events").alias("n"),
        F.col("0_1_aggregate_property_sum").alias("sum_value"),
    )


@query(
    "api_json_group_segmentation",
    oracle=f"""
    WITH e AS (
      SELECT *, user_id % 50 AS org_id FROM events WHERE {S.ts_between(*S.T_FULL)}
    )
    SELECT {S.bucket('day')} AS bucket,
           COUNT(*) AS n, COUNT(DISTINCT org_id) AS active_orgs
    FROM e GROUP BY 1
    """,
)
def api_json_group_segmentation(spark, sf_dir):
    """A reference payload with ``"group": 1`` — the non-user entity
    path through the JSON API (reference GROUPS_COUNT = 5 group
    entities, common/src/lib.rs:16-22; api.GROUP_COLS registers the
    org entity exactly as the reference registers group tables)."""
    from ..api import parse_event_segmentation
    from ..queries.event_segmentation import run_event_segmentation

    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00",
                 "to": "2024-01-31T23:59:59"},
        "group": 1,
        "intervalUnit": "day",
        "chartType": "line",
        "analysis": {"type": "linear"},
        "events": [{
            "eventName": None, "eventType": "regular",
            "queries": [
                {"type": "countEvents"},
                {"type": "dailyActiveGroups"},
            ],
        }],
    }
    req = parse_event_segmentation(body)
    assert req.group_col == "org_id"
    events = load_table(spark, sf_dir, "events").withColumn(
        "org_id", F.col("user_id") % 50
    )
    df = run_event_segmentation(events, req)
    return df.select(
        F.col("bucket"),
        F.col("0_0_count_events").alias("n"),
        F.col("0_1_daily_active_groups").alias("active_orgs"),
    )


@query(
    "api_json_custom_event",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events WHERE {S.ts_between(*S.T_FULL)}
      AND (event_type = 'view'
           OR (event_type = 'click'
               AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50))
    GROUP BY 1
    """,
)
def api_json_custom_event(spark, sf_dir):
    """A custom event arriving through the JSON API: the parser
    resolves ``{"eventType": "custom", "eventId": 7}`` against a
    catalog and expands it to an OR of member events with their
    filters (reference metadata resolution + expansion,
    query/src/expr.rs:60-115)."""
    from ..api import parse_event_segmentation
    from ..queries.event_segmentation import run_event_segmentation

    catalog = {
        7: [
            {"eventName": "view", "eventType": "regular"},
            {"eventName": "click", "eventType": "regular",
             "filters": [{"type": "property", "propertyType": "event",
                          "propertyName": "k", "operation": "gte", "value": [50]}]},
        ]
    }
    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00",
                 "to": "2024-01-31T23:59:59"},
        "group": "user",
        "intervalUnit": "day",
        "chartType": "line",
        "analysis": {"type": "linear"},
        "events": [{
            "eventType": "custom", "eventId": 7,
            "queries": [{"type": "countEvents"}],
        }],
    }
    req = parse_event_segmentation(body, custom_events=catalog)
    events = load_table(spark, sf_dir, "events")
    df = run_event_segmentation(events, req)
    return df.select(F.col("bucket"), F.col("0_0_count_events").alias("n"))


# ------------------------------------------------------------------ Formula

@query(
    "seg_formula_value_per_event",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, event_type,
           {S.sum_exact('value')} AS sum_value,
           COUNT(*) AS n,
           {S.sum_exact('value')} / COUNT(*) AS value_per_event
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1, 2
    """,
)
def seg_formula_value_per_event(spark, sf_dir):
    """QueryFormula: an SQL expression over sibling metric aliases.
    Declared in the reference DSL (common/src/event_segmentation.rs:74-76)
    but `unimplemented!` engine-side (query/src/event_segmentation.rs:922);
    native here via a post-aggregation `F.expr` projection."""
    req = EventSegmentationRequest(
        time=_FULL,
        interval=TimeIntervalUnit.DAY,
        events=[],
        breakdowns=[PropertyRef.column("event_type")],
    )
    eq = EventQuery(
        EventRef(),
        [
            SegQuery("aggregate_property", agg=AggFn.SUM, prop=PropertyRef.column("value"), alias="sum_value"),
            SegQuery("count_events", alias="n"),
            SegQuery("formula", formula="sum_value / n", alias="value_per_event"),
        ],
    )
    return _seg(spark, sf_dir, req, eq)


# ------------------------------------------------------------ AggregateProperty

@query(
    "seg_sum_value_daily_by_type",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, event_type, {S.sum_exact('value')} AS sum_value
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1, 2
    """,
)
def seg_sum_value_daily_by_type(spark, sf_dir):
    req = EventSegmentationRequest(
        time=_FULL,
        interval=TimeIntervalUnit.DAY,
        events=[],
        breakdowns=[PropertyRef.column("event_type")],
    )
    eq = EventQuery(
        EventRef(),
        [SegQuery("aggregate_property", agg=AggFn.SUM, prop=PropertyRef.column("value"), alias="sum_value")],
    )
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_multi_agg_weekly",
    oracle=f"""
    SELECT {S.bucket('week')} AS bucket,
           {S.avg_exact('value')} AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           COUNT(value) AS cnt_value
    FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
    GROUP BY 1
    """,
)
def seg_multi_agg_weekly(spark, sf_dir):
    """avg/min/max/count of a numeric property per week bucket."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.WEEK, events=[])
    v = PropertyRef.column("value")
    eq = EventQuery(
        EventRef("purchase"),
        [
            SegQuery("aggregate_property", agg=AggFn.AVG, prop=v, alias="avg_value"),
            SegQuery("aggregate_property", agg=AggFn.MIN, prop=v, alias="min_value"),
            SegQuery("aggregate_property", agg=AggFn.MAX, prop=v, alias="max_value"),
            SegQuery("aggregate_property", agg=AggFn.COUNT, prop=v, alias="cnt_value"),
        ],
    )
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_percentiles_by_type",
    oracle=f"""
    SELECT event_type,
           median(value) AS med_value,
           quantile_cont(value, 0.25) AS p25_value,
           quantile_cont(value, 0.90) AS p90_value,
           COUNT(DISTINCT value) AS dc_value
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_percentiles_by_type(spark, sf_dir):
    """Median / exact percentiles / distinct count — declared in the
    reference DSL but unimplemented there (common/src/query.rs:41-47);
    native in Spark so implemented here."""
    from ..exprs import full_filter

    events = load_table(spark, sf_dir, "events")
    cond = full_filter(time=_FULL)
    return (
        events.filter(cond)
        .groupBy("event_type")
        .agg(
            F.median("value").alias("med_value"),
            F.percentile("value", F.lit(0.25)).alias("p25_value"),
            F.percentile("value", F.lit(0.90)).alias("p90_value"),
            F.count_distinct("value").alias("dc_value"),
        )
    )


# ------------------------------------------------- distinct users (DAU/WAU/MAU)

@query(
    "seg_dau",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, COUNT(DISTINCT user_id) AS dau
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_dau(spark, sf_dir):
    """DailyActiveGroups (reference event_segmentation.rs:866-926)."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.DAY, events=[])
    eq = EventQuery(EventRef(), [SegQuery("count_unique_groups", alias="dau")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_wau",
    oracle=f"""
    SELECT {S.bucket('week')} AS bucket, COUNT(DISTINCT user_id) AS wau
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_wau(spark, sf_dir):
    """WeeklyActiveGroups — unimplemented!() in the reference
    (query/src/event_segmentation.rs:885-886); implemented here."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.WEEK, events=[])
    eq = EventQuery(EventRef(), [SegQuery("weekly_active_groups", alias="wau")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_mau",
    oracle=f"""
    SELECT {S.bucket('month')} AS bucket, COUNT(DISTINCT user_id) AS mau
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_mau(spark, sf_dir):
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.MONTH, events=[])
    eq = EventQuery(EventRef(), [SegQuery("monthly_active_groups", alias="mau")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_dau_by_week",
    oracle=f"""
    SELECT {S.bucket('week')} AS bucket,
           COUNT(DISTINCT (user_id, {S.bucket('day')})) AS active_days
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_dau_by_week(spark, sf_dir):
    """DailyActiveGroups under a weekly chart: distinct (user, day)
    pairs per week bucket."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.WEEK, events=[])
    eq = EventQuery(EventRef(), [SegQuery("daily_active_groups", alias="active_days")])
    return _seg(spark, sf_dir, req, eq)


# ------------------------------------------------------ two-level per-user aggs

@query(
    "seg_count_per_user_avg",
    oracle=f"""
    SELECT bucket, {S.avg_exact('x')} AS cpg
    FROM (
      SELECT {S.bucket('day')} AS bucket, user_id, COUNT(*) AS x
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1, 2
    ) GROUP BY bucket
    """,
)
def seg_count_per_user_avg(spark, sf_dir):
    """CountPerGroup{avg}: per-user event count, averaged over users
    (reference PartitionedCount, partitioned/count.rs:59-571)."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.DAY, events=[])
    eq = EventQuery(
        EventRef(), [SegQuery("count_per_group", agg=AggFn.AVG, alias="cpg")]
    )
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_sum_per_user_outer",
    oracle=f"""
    SELECT bucket,
           {S.avg_exact('x')} AS avg_user_rev,
           MAX(x) AS max_user_rev,
           {S.sum_exact('x')} AS sum_user_rev
    FROM (
      SELECT {S.bucket('day')} AS bucket, user_id, {S.sum_exact('value')} AS x
      FROM events
      WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      GROUP BY 1, 2
    ) GROUP BY bucket
    """,
)
def seg_sum_per_user_outer(spark, sf_dir):
    """AggregatePropertyPerGroup: inner sum(value) per user, outer
    avg/max/sum over users (reference PartitionedAggregate,
    partitioned/aggregate.rs:83-1126)."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.DAY, events=[])
    v = PropertyRef.column("value")
    eq = EventQuery(
        EventRef("purchase"),
        [
            SegQuery("aggregate_property_per_group", agg=AggFn.AVG, inner_agg=AggFn.SUM, prop=v, alias="avg_user_rev"),
            SegQuery("aggregate_property_per_group", agg=AggFn.MAX, inner_agg=AggFn.SUM, prop=v, alias="max_user_rev"),
            SegQuery("aggregate_property_per_group", agg=AggFn.SUM, inner_agg=AggFn.SUM, prop=v, alias="sum_user_rev"),
        ],
    )
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_mixed_levels",
    oracle=f"""
    WITH f AS (
      SELECT {S.bucket('week')} AS bucket, user_id, value
      FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type IN ('view', 'click')
    ),
    simple AS (
      SELECT bucket, COUNT(*) AS n, {S.sum_exact('value')} AS sum_v
      FROM f GROUP BY 1
    ),
    two_level AS (
      SELECT bucket, {S.avg_exact('x')} AS avg_per_user
      FROM (SELECT bucket, user_id, COUNT(*) AS x FROM f GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT simple.bucket AS bucket, n, sum_v, avg_per_user
    FROM simple JOIN two_level ON simple.bucket = two_level.bucket
    """,
)
def seg_mixed_levels(spark, sf_dir):
    """Single-level and two-level metrics in one request — exercises
    the join-on-group-keys path of event_segmentation_one."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.WEEK, events=[])
    eq = EventQuery(
        EventRef(custom=[
            EventFilterSpec(EventRef("view")),
            EventFilterSpec(EventRef("click")),
        ]),
        [
            SegQuery("count_events", alias="n"),
            SegQuery("aggregate_property", agg=AggFn.SUM, prop=PropertyRef.column("value"), alias="sum_v"),
            SegQuery("count_per_group", agg=AggFn.AVG, alias="avg_per_user"),
        ],
    )
    return _seg(spark, sf_dir, req, eq)


# ------------------------------------------------------------- filters & events

@query(
    "seg_filter_json_prop",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events
    WHERE {S.ts_between(*S.T_FULL)}
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY 1
    """,
)
def seg_filter_json_prop(spark, sf_dir):
    """Filter on a JSON property (the reference materializes properties
    as physical columns; unmaterialized ones map to JSON extraction)."""
    req = EventSegmentationRequest(
        time=_FULL,
        interval=TimeIntervalUnit.DAY,
        events=[],
        filters=[PropFilter(PropertyRef.json("k", "int64"), PropOp.GTE, [50])],
    )
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_filter_ops",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE {S.ts_between(*S.T_FULL)}
      AND (event_type LIKE '%u%' OR event_type LIKE 'cl%')
      AND regexp_matches(event_type, '^(s|c|p)')
      AND event_type <> 'error'
      AND value IS NOT NULL
    GROUP BY 1
    """,
)
def seg_filter_ops(spark, sf_dir):
    """LIKE / regex / NEQ / EXISTS property operators (reference
    query/src/expr.rs:299-391 full PropValueOperation set)."""
    req = EventSegmentationRequest(
        time=_FULL,
        interval=TimeIntervalUnit.DAY,
        events=[],
        filters=[
            PropFilter(PropertyRef.column("event_type"), PropOp.LIKE, ["%u%", "cl%"]),
            PropFilter(PropertyRef.column("event_type"), PropOp.REGEX, ["^(s|c|p)"]),
            PropFilter(PropertyRef.column("event_type"), PropOp.NEQ, ["error"]),
            PropFilter(PropertyRef.column("value"), PropOp.EXISTS),
        ],
        breakdowns=[PropertyRef.column("event_type")],
    )
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    out = _seg(spark, sf_dir, req, eq)
    return out.groupBy("event_type").agg(F.sum("n").alias("n"))


@query(
    "seg_custom_event",
    oracle=f"""
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events
    WHERE {S.ts_between(*S.T_FULL)}
      AND (event_type = 'signup'
           OR (event_type = 'purchase' AND value > 100))
    GROUP BY 1
    """,
)
def seg_custom_event(spark, sf_dir):
    """Custom event = OR of member events with their own filters
    (reference query/src/expr.rs:60-115 recursive expansion)."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.DAY, events=[])
    custom = EventRef(custom=[
        EventFilterSpec(EventRef("signup")),
        EventFilterSpec(
            EventRef("purchase"),
            [PropFilter(PropertyRef.column("value"), PropOp.GT, [100])],
        ),
    ])
    eq = EventQuery(custom, [SegQuery("count_events", alias="n")])
    return _seg(spark, sf_dir, req, eq)


@query(
    "seg_breakdown_json_prop",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n, {S.sum_exact('value')} AS sum_v
    FROM events WHERE {S.ts_between(*S.T_FULL)}
    GROUP BY 1
    """,
)
def seg_breakdown_json_prop(spark, sf_dir):
    """Breakdown by a derived JSON property."""
    from ..exprs import full_filter, prop_col

    events = load_table(spark, sf_dir, "events")
    k = prop_col(PropertyRef.json("k", "int64")) % 10
    return (
        events.filter(full_filter(time=_FULL))
        .groupBy(k.alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DECIMAL_T)).cast("double").alias("sum_v"),
        )
    )


# ------------------------------------------------------------ multi-event merge

@query(
    "seg_multi_event_merge",
    oracle=f"""
    SELECT 'signup' AS event, {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'signup'
    GROUP BY 2
    UNION ALL
    SELECT 'purchase' AS event, {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
    GROUP BY 2
    """,
)
def seg_multi_event_merge(spark, sf_dir):
    """Per-event plans combined with MergeNode + event discriminator
    column (reference logical_plan/merge.rs:21-115, SURVEY §2.9)."""
    req = EventSegmentationRequest(time=_FULL, interval=TimeIntervalUnit.DAY, events=[])
    dfs = [
        _seg(spark, sf_dir, req, EventQuery(EventRef(name), [SegQuery("count_events", alias="n")]))
        for name in ("signup", "purchase")
    ]
    return merge_frames(dfs, names=["signup", "purchase"])
