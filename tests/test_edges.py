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
