"""Record-search oracle suite: event records, group (profile) records,
property values."""

from __future__ import annotations

import datetime as dt

from ..dsl import (
    EventFilterSpec,
    EventRef,
    PropFilter,
    PropOp,
    PropertyRef,
    QueryTime,
)
from ..operators.records import (
    event_record_by_id,
    event_records_search,
    group_record_by_id,
    group_records_search,
    latest_profile,
    property_values,
)
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


@query(
    "event_records_search_purchases",
    oracle=f"""
    SELECT * FROM events
    WHERE {S.ts_between(*S.T_FULL)}
      AND (event_type = 'purchase' OR (event_type = 'view' AND value >= 100))
    ORDER BY event_id DESC LIMIT 100
    """,
)
def event_records_search_purchases(spark, sf_dir):
    """Event-records search: filter → sort event_id desc → limit 100
    (reference query/src/event_records.rs:223-419)."""
    events = load_table(spark, sf_dir, "events")
    return event_records_search(
        events,
        time=_FULL,
        event_specs=[
            EventFilterSpec(EventRef("purchase")),
            EventFilterSpec(EventRef("view"),
                            [PropFilter(PropertyRef.column("value"), PropOp.GTE, [100])]),
        ],
    )


@query(
    "group_records_top_value",
    oracle="""
    SELECT * FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY value DESC, user_id ASC LIMIT 100
    """,
)
def group_records_top_value(spark, sf_dir):
    """Group-records with replacing semantics: latest profile row per
    user, sorted by a property (reference group_records.rs:220-364 +
    is_replacing storage, FIXTURES.md §3)."""
    events = load_table(spark, sf_dir, "events")
    return group_records_search(events, "value", ascending=False)


@query(
    "event_record_by_id",
    oracle="SELECT * FROM events WHERE event_id = 4242",
)
def event_record_by_id_q(spark, sf_dir):
    """Point lookup by event id (reference event_records.rs:83-150);
    the equality predicate reaches the parquet scan for row-group
    pruning."""
    events = load_table(spark, sf_dir, "events")
    return event_record_by_id(events, 4242)


@query(
    "group_record_by_id",
    oracle="""
    SELECT * FROM events WHERE user_id = 77
    QUALIFY row_number() OVER (ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def group_record_by_id_q(spark, sf_dir):
    """Point lookup of one profile with replacing semantics (reference
    group_records.rs:79-150): filter to the entity, then latest
    version wins."""
    events = load_table(spark, sf_dir, "events")
    return group_record_by_id(events, 77)


@query(
    "property_values_event_type",
    oracle="""
    SELECT DISTINCT event_type AS value FROM events
    WHERE event_type IS NOT NULL ORDER BY 1 LIMIT 1000
    """,
)
def property_values_event_type(spark, sf_dir):
    """Property-values listing (reference properties.rs:86-195)."""
    events = load_table(spark, sf_dir, "events")
    return property_values(events, PropertyRef.column("event_type"))


@query(
    "property_values_json_like",
    oracle="""
    SELECT DISTINCT json_extract_string(props, '$.k') AS value FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
      AND json_extract_string(props, '$.k') LIKE '1%'
    ORDER BY 1 LIMIT 1000
    """,
)
def property_values_json_like(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return property_values(events, PropertyRef.json("k"), filter_like="1%")


@query(
    "latest_profile_all",
    oracle="""
    SELECT user_id, ts, event_type, value FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def latest_profile_all(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return latest_profile(events).select("user_id", "ts", "event_type", "value")
