"""Regression tests for the round-9 advisor findings (ADVICE.md r10):

1. activity_supports must refuse a rollup whose group grain differs
   from the grain the caller asks about (org-grain rollup must not
   answer a user-grain stickiness question).
2. event_segmentation_from_rollup must join metric parts null-safely —
   a NULL breakdown dim (missing JSON key) is one group, not dropped.
3. build_rollup with group_col (or a declared prop) also listed as a
   dim must not produce an ambiguous duplicate column.
4. QuantileSketch empty sketches serialize identically regardless of
   the fold shape that produced them (fresh vs merge-of-empties).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from optiprism_spark.dsl import (
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    QueryTime,
    SegQuery,
    TimeIntervalUnit,
)
from optiprism_spark.operators.aggregates import event_segmentation_one
from optiprism_spark.rollup import (
    RollupSpec,
    activity_supports,
    build_rollup,
    event_segmentation_from_rollup,
    rollup_supports,
)
from optiprism_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.001"

T_DAYS = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59, 999999)
)


# ------------------------------------------------- 1. group-grain guard


def test_activity_supports_rejects_wrong_group_grain():
    org_spec = RollupSpec(group_col="org_id")
    user_spec = RollupSpec()  # group_col = user_id
    # default caller grain is user: org rollup must not route
    assert not activity_supports(T_DAYS, None, (), org_spec)
    assert activity_supports(T_DAYS, None, (), user_spec)
    # explicit caller grain: only the matching spec routes
    assert activity_supports(T_DAYS, None, (), org_spec, group_col="org_id")
    assert not activity_supports(
        T_DAYS, None, (), user_spec, group_col="org_id")


def test_stickiness_never_routes_through_org_rollup(spark, tmp_path):
    """An org-grain rollup as the project's only declared rollup must
    fall back to the raw user-grain scan, not silently answer with
    org stickiness."""
    from optiprism_spark.operators.engagement import stickiness
    from optiprism_spark.rollup import RollupStore

    events = load_table(spark, SF_DIR, "events").withColumn(
        "org_id", F.col("user_id") % 3)
    org_spec = RollupSpec(group_col="org_id")
    store = RollupStore(str(tmp_path / "rollup_org"), org_spec)
    store.rebuild(spark, events)
    assert not activity_supports(T_DAYS, None, (), org_spec)
    raw = stickiness(events, T_DAYS, period=TimeIntervalUnit.WEEK)
    assert raw.count() > 0  # the fallback path remains answerable


# ------------------------------------------- 2. null-safe metric join


def test_rollup_mixed_metrics_keep_null_breakdown_group(spark):
    """count_events + approx daily_active_groups with a JSON breakdown
    that is NULL for some rows: routed result must keep the NULL group
    (null-safe join), matching the raw path's groups."""
    rows = []
    ts = dt.datetime(2024, 1, 2, 10)
    for uid in range(40):
        # half the rows carry {"plan": ...}, half lack the key → NULL dim
        props = '{"plan": "pro"}' if uid % 2 == 0 else "{}"
        rows.append((uid, ts, uid, "view", 1.0, props))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    spec = RollupSpec(json_dims=(("plan", "string"),))
    roll = build_rollup(events, spec)
    from optiprism_spark.dsl import PropertyRef

    req = EventSegmentationRequest(
        time=T_DAYS,
        interval=TimeIntervalUnit.DAY,
        events=(
            EventQuery(
                event=EventRef("view"),
                queries=(
                    SegQuery(kind="count_events"),
                    SegQuery(kind="daily_active_groups", approx=True),
                ),
                breakdowns=(PropertyRef.json("plan", "string"),),
            ),
        ),
        group_col="user_id",
    )
    assert rollup_supports(req, req.events[0], spec)
    routed = event_segmentation_from_rollup(
        roll, req, req.events[0], spec=spec).collect()
    plans = {r["plan"] for r in routed}
    assert None in plans and "pro" in plans, plans
    raw = event_segmentation_one(events, req, req.events[0]).collect()
    # same groups; count_events values identical (HLL exact at n=20)
    assert {(r["plan"], r["0_0_count_events"]) for r in routed} == {
        (r["plan"], r["0_0_count_events"]) for r in raw
    }


# ------------------------------------------ 3. dim/value-col collision


def test_build_rollup_group_col_as_dim_no_ambiguity(spark):
    events = load_table(spark, SF_DIR, "events")
    spec = RollupSpec(dims=("event_type", "user_id"))  # group_col is a dim
    roll = build_rollup(events, spec)
    assert roll.columns.count("user_id") == 1
    # downstream reference must resolve (was ambiguous before the fix)
    assert roll.filter(F.col("user_id") >= 0).count() > 0


def test_build_rollup_numeric_prop_as_dim_no_ambiguity(spark):
    events = load_table(spark, SF_DIR, "events")
    spec = RollupSpec(dims=("event_type", "value"))
    roll = build_rollup(events, spec)
    assert roll.columns.count("value") == 1
    assert roll.groupBy("value").count().count() > 0


# ----------------------------------------- 4. empty-sketch determinism


def test_empty_sketch_bytes_identical_across_fold_shapes():
    from optiprism_spark.operators.qsketch import QuantileSketch

    fresh = QuantileSketch(64).to_bytes()
    from_vals = QuantileSketch.from_values([], k=64).to_bytes()
    nan_only = QuantileSketch.from_values([float("nan")], k=64).to_bytes()
    merged = QuantileSketch(64).merge(QuantileSketch(64)).to_bytes()
    chain = QuantileSketch.merge_all(
        [QuantileSketch(64), QuantileSketch(64), QuantileSketch(64)], k=64
    ).to_bytes()
    assert fresh == from_vals == nan_only == merged == chain
    # and the round-trip of a trimmed empty sketch stays empty
    rt = QuantileSketch.from_bytes(merged)
    assert rt.total_weight == 0 and rt.quantile(0.5) is None


def test_empty_merge_nonempty_matches_from_values():
    from optiprism_spark.operators.qsketch import QuantileSketch

    vals = [3.0, 1.0, 2.0, -0.0, 5.5]
    a = QuantileSketch(64).merge(QuantileSketch.from_values(vals, k=64))
    b = QuantileSketch.from_values(vals, k=64)
    assert a.to_bytes() == b.to_bytes()
