"""Record-search surfaces — SURVEY §2.8 / §3.3.

- event-records search (reference query/src/event_records.rs:223-419):
  filter(project ∧ time ∧ OR(event exprs)) → sort event_id desc →
  limit 100.
- group-records (reference query/src/group_records.rs:220-364): scan
  the profile table with REPLACING semantics (latest version per id
  wins) → sort by property → limit 100. The driver testdata has no
  profile table, so `latest_profile` derives one from the stream:
  row_number over (user, ts desc) = 1 — the exact Spark idiom for the
  reference's ReplacingMergeTree-style storage (FIXTURES.md §3).
- property-values (reference query/src/properties.rs:119-195):
  distinct column values, sorted, limit 1000.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dsl import EventFilterSpec, PropFilter, QueryTime
from ..exprs import event_spec_expression, full_filter, multi_or, prop_col
from ..schema import EVENT_ID_COL, EVENT_TIME_COL, EVENT_USER_COL

RECORDS_LIMIT = 100  # reference event_records.rs:344-348
VALUES_LIMIT = 1000  # reference properties.rs:188-192


def event_records_search(
    events: DataFrame,
    time: Optional[QueryTime] = None,
    event_specs: Sequence[EventFilterSpec] = (),
    filters: Sequence[PropFilter] = (),
    limit: int = RECORDS_LIMIT,
) -> DataFrame:
    cond = full_filter(time, None, filters)
    df = events.filter(cond) if cond is not None else events
    if event_specs:
        spec_cond = multi_or([event_spec_expression(s) for s in event_specs])
        if spec_cond is not None:  # None = a match-all spec: no filter
            df = df.filter(spec_cond)
    return df.orderBy(F.desc(EVENT_ID_COL)).limit(limit)


def event_record_by_id(events: DataFrame, record_id: int) -> DataFrame:
    """Point lookup by event id (reference event_records.rs:83-150
    get_by_id: full-projection scan filtered to one id). The equality
    predicate pushes into the parquet scan, so row-group min/max stats
    prune everything but the containing group at scale."""
    return events.filter(F.col(EVENT_ID_COL) == F.lit(int(record_id)))


def group_record_by_id(
    events: DataFrame, entity_id: int, user_col: str = EVENT_USER_COL
) -> DataFrame:
    """Point lookup of one group profile with replacing semantics
    (reference group_records.rs:79-150 get_by_id over an is_replacing
    table). Filter FIRST, then take the latest version — the window
    runs over one entity's rows, not the whole table."""
    return latest_profile(
        events.filter(F.col(user_col) == F.lit(int(entity_id))), user_col
    )


def latest_profile(events: DataFrame, user_col: str = EVENT_USER_COL) -> DataFrame:
    """Replacing-table read: latest row per user (version ≙ (ts,
    event_id)). Maps the reference's `is_replacing` group tables
    (storage/src/db.rs:802-864) to a window dedup."""
    w = Window.partitionBy(user_col).orderBy(F.desc(EVENT_TIME_COL), F.desc(EVENT_ID_COL))
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def group_records_search(
    events: DataFrame,
    sort_prop: str,
    ascending: bool = True,
    limit: int = RECORDS_LIMIT,
    user_col: str = EVENT_USER_COL,
    time=None,
    filters: "Sequence" = (),
) -> DataFrame:
    """``user_col`` selects the group entity (org_id for group 1, ...):
    the replacing-read dedups one profile per ENTITY of that group —
    searching orgs must not return one row per user. ``sort_prop``
    resolves as a physical column when present, else as a JSON props
    key (same fallback the query plane uses) so sorting by an
    unmaterialized property is an ordered scan, not an
    unresolved-column crash."""
    cond = full_filter(time, None, filters)
    if cond is not None:
        events = events.filter(cond)
    prof = latest_profile(events, user_col)
    if sort_prop in prof.columns:
        sort_col = F.col(sort_prop)
    else:
        from ..dsl import PropertyRef

        sort_col = prop_col(PropertyRef.json(sort_prop))
    order = sort_col.asc() if ascending else sort_col.desc()
    # deterministic tie-break on the entity key
    return prof.orderBy(order, F.asc(user_col)).limit(limit)


def property_values(
    df: DataFrame, prop, filter_like: Optional[str] = None, limit: int = VALUES_LIMIT
) -> DataFrame:
    """Distinct property values, sorted asc, capped (reference
    properties.rs:86-195; the optional LIKE narrows suggestions)."""
    c = prop_col(prop)
    out = df.select(c.alias("value")).filter(F.col("value").isNotNull())
    if filter_like:
        out = out.filter(F.col("value").like(filter_like))
    return out.distinct().orderBy("value").limit(limit)
