"""Shared percentile-edge recipe (operators/edges.py, r15): the auto
exact → approx regime switch closing the last single-task-memory seam
(r14 verdict What's-wrong #1). Exact stays the oracle regime below
the sizing threshold; beyond it the plan must carry the bounded-
buffer percentile_approx aggregate, and all three callers (RFM,
curriculum, drift quantile bins) keep structurally valid output in
the approx regime."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from optiprism_spark.operators.edges import percentile_edges


def _frame(spark, n=1000):
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v"))


def test_auto_switches_on_threshold(spark):
    df = _frame(spark)
    qs = [0.25, 0.5, 0.75]
    # under the (overridden) ceiling: exact — F.percentile in the plan
    edges, mode = percentile_edges(
        df, [("v", qs, "q")], mode="auto", n_rows=1000,
        exact_max_rows=10_000)
    assert mode == "exact"
    assert "percentile(" in edges._jdf.queryExecution(
    ).optimizedPlan().toString()
    # over it: approx — the bounded-buffer aggregate in the plan
    edges_a, mode_a = percentile_edges(
        df, [("v", qs, "q")], mode="auto", n_rows=1000,
        exact_max_rows=999)
    assert mode_a == "approx"
    assert "percentile_approx" in edges_a._jdf.queryExecution(
    ).optimizedPlan().toString()
    # n_rows unknown: the helper counts the frame itself
    _, mode_c = percentile_edges(
        df, [("v", qs, "q")], mode="auto", exact_max_rows=999)
    assert mode_c == "approx"

    # approx edges are true order statistics within rank error — on
    # this distinct-ish fixture they sit within one value step of the
    # exact interpolated edges
    ex = edges.collect()[0]
    ap = edges_a.collect()[0]
    for i in range(3):
        assert abs(ex[f"__q{i}"] - ap[f"__q{i}"]) <= 1.0, (i, ex, ap)

    with pytest.raises(ValueError, match="mode must be one of"):
        percentile_edges(df, [("v", qs, "q")], mode="sketchy")


def test_metric_records_decision(spark):
    from optiprism_spark import metrics

    df = _frame(spark, 100)
    before = metrics.percentile_edge_mode_total().value(
        surface="t_edges", mode="approx")
    percentile_edges(df, [("v", [0.5], "q")], mode="approx",
                     surface="t_edges")
    after = metrics.percentile_edge_mode_total().value(
        surface="t_edges", mode="approx")
    assert after == before + 1


def test_rfm_approx_regime_structurally_valid(spark):
    """A whale-count corpus can't run exact edges; the approx regime
    must still produce 1..n_tiles scores with ~equi-depth masses."""
    from optiprism_spark.dsl import QueryTime
    from optiprism_spark.operators.engagement import rfm_scores

    rows = []
    for u in range(500):
        rows.append((u, dt.datetime(2024, 1, 1 + u % 28, 12), u,
                     "purchase", float(u % 211), "{}"))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    W = QueryTime.between(dt.datetime(2024, 1, 1),
                          dt.datetime(2024, 1, 31, 23, 59, 59))
    out = rfm_scores(events, W, n_tiles=5,
                     percentile_mode="approx").collect()
    assert len(out) == 500
    for dim in ("r_score", "f_score", "m_score"):
        scores = [r[dim] for r in out]
        assert set(scores) <= set(range(1, 6))
    # monetary is distinct-heavy: every tile populated, roughly equal
    from collections import Counter
    m = Counter(r["m_score"] for r in out)
    assert set(m) == {1, 2, 3, 4, 5}
    assert max(m.values()) - min(m.values()) <= 25


def test_curriculum_approx_regime(spark):
    from optiprism_spark.operators.assembly import curriculum_phases

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 179).cast("double").alias("score"))
    out = curriculum_phases(docs, "score", n_phases=4,
                            percentile_mode="approx").collect()
    assert len(out) == 400
    phases = {r["phase"] for r in out}
    assert phases == {0, 1, 2, 3}
    # phases are monotone in score: max score of phase p <= min of p+1
    by_phase = {}
    for r in out:
        by_phase.setdefault(r["phase"], []).append(r["score"])
    for p in range(3):
        assert max(by_phase[p]) <= min(by_phase[p + 1])


def test_drift_quantile_approx_regime(spark):
    from optiprism_spark.operators.drift import distribution_drift_quantile

    df = spark.range(2000).select(
        (F.col("id") % 503).cast("double").alias("v"),
        (F.col("id") % 2 == 0).alias("is_base"))
    out = distribution_drift_quantile(
        df, "v", F.col("is_base"), n_bins=10,
        percentile_mode="approx").collect()
    assert len(out) == 10
    # identical halves → PSI contributions ~0 in every occupied bin
    assert all(abs(r["psi_contrib"]) < 1e-6 for r in out)
