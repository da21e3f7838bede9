"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. run_event_segmentation with >1 events × >1 segments must keep every
   frame (merge_frames used to zip-truncate to one name per event).
2. embedding_near_pairs(use_lsh=True) must run (hyperplane_bucket used
   to hard-code column `__v`) and return a subset of the exact pairs.
3. A non-step event with a deviating holding-constant value resets the
   funnel attempt (reference check_constants runs on EVERY row,
   funnel.rs:571-584) — the kernel must see the full stream.
4. JSON-prop filters infer dtype from their literal values; string
   values are not nulled by an int64 cast.
5. did_event "fewer than N" / "never did" cohorts include users with
   zero matching events.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from optiprism_spark.dsl import (
    EventFilterSpec,
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    FunnelRequest,
    FunnelStep,
    PropOp,
    PropertyRef,
    QueryTime,
    SegmentCondition,
    SegQuery,
    TimeIntervalUnit,
)

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)
_TIME = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))


def _events(spark, rows):
    return spark.createDataFrame(rows, _EVENTS_SCHEMA)


# ---------------------------------------------------------- 1. merge names


def test_merge_frames_rejects_name_mismatch(spark):
    from optiprism_spark.operators.reshape import merge_frames

    df = spark.range(1)
    with pytest.raises(ValueError, match="names"):
        merge_frames([df, df, df], names=["a", "b"])


def test_multi_event_multi_segment_keeps_every_frame(spark):
    from optiprism_spark.queries.event_segmentation import run_event_segmentation

    rows = [
        (0, dt.datetime(2024, 1, 1, 10), 1, "view", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 11), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 12), 2, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 13), 2, "click", 1.0, "{}"),
    ]
    events = _events(spark, rows)
    req = EventSegmentationRequest(
        time=_TIME, interval=TimeIntervalUnit.DAY,
        events=[
            EventQuery(EventRef("view"), [SegQuery("count_events")]),
            EventQuery(EventRef("click"), [SegQuery("count_events")]),
        ],
    )
    segs = {
        "u1": spark.createDataFrame([(1,)], "user_id long"),
        "u2": spark.createDataFrame([(2,)], "user_id long"),
    }
    out = run_event_segmentation(events, req, segment_users=segs).collect()
    # 2 events × 2 segments × 1 bucket — and the discriminator column
    # must label BOTH frames of each event with that event's name
    assert len(out) == 4
    by_event = {}
    for r in out:
        by_event.setdefault(r["event"], set()).add(r["segment"])
    assert by_event == {"view": {"u1", "u2"}, "click": {"u1", "u2"}}


# ------------------------------------------------------------- 2. LSH pairs


def test_embedding_near_pairs_lsh_runs_and_is_subset(spark):
    from optiprism_spark.operators.similarity import embedding_near_pairs

    import math

    def vec(seed, dim=8):
        return [math.sin(seed * 37 + i) for i in range(dim)]

    base = vec(1)
    rows = [
        (1, base),
        (2, [x * 1.0001 for x in base]),  # near-dup of 1
        (3, vec(2)),
        (4, vec(3)),
        (5, [x * 0.9999 for x in base]),  # near-dup of 1 and 2
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.doc_a, r.doc_b)
        for r in embedding_near_pairs(emb, threshold=0.99, exact=True).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in embedding_near_pairs(emb, threshold=0.99).collect()
    }
    assert exact >= {(1, 2), (1, 5), (2, 5)}
    assert lsh <= exact  # LSH never invents pairs
    assert (1, 2) in lsh  # identical-direction vectors share every sign bit


# --------------------------------------------- 3. constants on non-step rows


def test_funnel_constant_violation_on_non_step_row_resets(spark):
    from optiprism_spark.operators.funnel import funnel_attempts

    mk = lambda i, h, et, v: (i, dt.datetime(2024, 1, 1, h), 1, et, v, "{}")
    # e1(v=1) → other(v=2) → e2(v=1): the reference resets at `other`
    # (constant deviates mid-funnel), so the funnel does NOT complete
    rows = [mk(0, 10, "e1", 1.0), mk(1, 11, "other", 2.0), mk(2, 12, "e2", 1.0)]
    req = FunnelRequest(
        time=_TIME, interval=TimeIntervalUnit.DAY,
        steps=[FunnelStep([EventFilterSpec(EventRef("e1"))]),
               FunnelStep([EventFilterSpec(EventRef("e2"))])],
        window_ms=86_400_000,
        constants=(PropertyRef.column("value"),),
    )
    out = funnel_attempts(_events(spark, rows), req).collect()
    assert not any(r.is_completed for r in out)

    # control: same stream, constant matches everywhere → completes
    rows_ok = [mk(0, 10, "e1", 1.0), mk(1, 11, "other", 1.0), mk(2, 12, "e2", 1.0)]
    out_ok = funnel_attempts(_events(spark, rows_ok), req).collect()
    assert any(r.is_completed for r in out_ok)


# ------------------------------------------------------- 4. dtype inference


def test_json_prop_filter_dtype_inference():
    from optiprism_spark.api import parse_filter

    f_str = parse_filter({"type": "property", "propertyType": "event",
                          "propertyName": "tier", "operation": "eq", "value": ["pro"]})
    assert f_str.prop.dtype == "string"
    f_int = parse_filter({"type": "property", "propertyType": "event",
                          "propertyName": "k", "operation": "gte", "value": [50]})
    assert f_int.prop.dtype == "int64"
    f_dec = parse_filter({"type": "property", "propertyType": "event",
                          "propertyName": "score", "operation": "gt", "value": [0.5]})
    assert f_dec.prop.dtype == "decimal"
    f_bool = parse_filter({"type": "property", "propertyType": "event",
                           "propertyName": "flag", "operation": "eq", "value": [True]})
    assert f_bool.prop.dtype == "boolean"
    # valueless ops and breakdowns stay string
    f_ex = parse_filter({"type": "property", "propertyType": "event",
                         "propertyName": "tier", "operation": "exists"})
    assert f_ex.prop.dtype == "string"


def test_json_prop_string_filter_matches_rows(spark):
    """End-to-end: a reference-shaped payload filtering on a string-
    valued JSON key must match rows (used to cast to long → all null)."""
    from optiprism_spark.api import parse_filter
    from optiprism_spark.exprs import property_expression

    rows = [
        (0, dt.datetime(2024, 1, 1, 10), 1, "e", 1.0, '{"tier": "pro"}'),
        (1, dt.datetime(2024, 1, 1, 11), 2, "e", 1.0, '{"tier": "free"}'),
    ]
    flt = parse_filter({"type": "property", "propertyType": "event",
                        "propertyName": "tier", "operation": "eq", "value": ["pro"]})
    got = _events(spark, rows).filter(property_expression(flt)).collect()
    assert [r.user_id for r in got] == [1]


# --------------------------------------------------- 5. zero-count cohorts


def test_did_event_fewer_than_includes_inactive_users(spark):
    from optiprism_spark.operators.segments import condition_users

    mk = lambda i, u, et: (i, dt.datetime(2024, 1, 1, 10 + i % 10), u, et, 1.0, "{}")
    rows = (
        [mk(i, 1, "buy") for i in range(3)]          # user 1: did buy 3×
        + [mk(10, 2, "buy")]                          # user 2: did buy 1×
        + [mk(20, 3, "view"), mk(21, 3, "view")]      # user 3: never bought
    )
    events = _events(spark, rows)

    lt2 = SegmentCondition("did_event", event=EventRef("buy"),
                           compare_op=PropOp.LT, right=2)
    assert {r.user_id for r in condition_users(events, lt2).collect()} == {2, 3}

    never = SegmentCondition("did_event", event=EventRef("buy"),
                             compare_op=PropOp.EQ, right=0)
    assert {r.user_id for r in condition_users(events, never).collect()} == {3}

    # the positive path is unchanged
    gte2 = SegmentCondition("did_event", event=EventRef("buy"),
                            compare_op=PropOp.GTE, right=2)
    assert {r.user_id for r in condition_users(events, gte2).collect()} == {1}
