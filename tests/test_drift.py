"""Drift operators: semantics + the plan shapes that survive 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optiprism_spark.operators.drift import distribution_drift, table_profile

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_profile_is_one_partial_aggregated_scan(spark):
    from optiprism_spark.schema import load_table

    events = load_table(spark, SF_SMOKE, "events")
    prof = table_profile(events, ["value"], by=["event_type"])
    plan = _plan(prof)
    # every statistic folds into ONE scan with map-side combine
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial" in plan.lower(), plan
    row = prof.filter(F.col("event_type") == "purchase").first()
    base = events.filter(F.col("event_type") == "purchase")
    assert row["n_rows"] == base.count()
    assert row["value_min"] == base.agg(F.min("value")).first()[0]


def test_psi_identical_populations_is_zero(spark):
    """Splitting one population randomly in half must read as no
    drift: every bin's contribution rounds to ~0 (smoothing keeps the
    tiny sampling noise bounded)."""
    df = spark.range(20_000).select(
        (F.col("id") % 1000).cast("double").alias("v"),
        (F.col("id") % 2 == 0).alias("s"),
    )
    out = distribution_drift(df, "v", split=F.col("s"), bins=10).collect()
    assert len(out) == 10
    assert sum(abs(r["psi_contrib"]) for r in out) < 1e-6
    # populations are equal halves, bins uniform
    assert all(r["n_expected"] == r["n_actual"] for r in out)


def test_psi_detects_a_shift(spark):
    """Expected uniform [0,1000); actual shifted to [500,1500): the
    moved mass must land as large contributions at BOTH tails."""
    lo = spark.range(10_000).select(
        (F.col("id") % 1000).cast("double").alias("v"), F.lit(True).alias("s"))
    hi = spark.range(10_000).select(
        (F.col("id") % 1000 + 500).cast("double").alias("v"),
        F.lit(False).alias("s"))
    out = distribution_drift(lo.unionByName(hi), "v",
                             split=F.col("s"), bins=10)
    rows = {r["bucket"]: r for r in out.collect()}
    psi = sum(r["psi_contrib"] for r in rows.values())
    assert psi > 0.5, psi  # canonical "significant shift" threshold is 0.25
    # bottom bins: expected-only mass; top bins: actual-only mass
    assert rows[1]["n_actual"] == 0 and rows[1]["n_expected"] > 0
    top = max(rows)
    assert rows[top]["n_expected"] == 0 and rows[top]["n_actual"] > 0


def test_psi_plan_broadcasts_bounds_no_cartesian(spark):
    from optiprism_spark.schema import load_table

    events = load_table(spark, SF_SMOKE, "events")
    out = distribution_drift(
        events, "value",
        split=F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    plan = _plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, \
        plan


def test_psi_null_values_excluded(spark):
    df = spark.createDataFrame(
        [(1.0, True), (None, True), (2.0, False), (None, False)],
        "v double, s boolean")
    out = distribution_drift(df, "v", split=F.col("s"), bins=2).collect()
    assert sum(r["n_expected"] + r["n_actual"] for r in out) == 2


def test_psi_null_split_rows_in_neither_population(spark):
    """A row whose split expression is NULL (e.g. NULL timestamp)
    belongs to neither population — it must not leak into n_actual
    via three-valued logic (r11 review finding)."""
    from optiprism_spark.operators.drift import categorical_drift

    df = spark.createDataFrame(
        [(1.0, "a", True), (2.0, "a", False), (3.0, "a", None)],
        "v double, c string, s boolean")
    out = distribution_drift(df, "v", split=F.col("s"), bins=2).collect()
    assert sum(r["n_expected"] + r["n_actual"] for r in out) == 2
    cat = categorical_drift(df, "c", split=F.col("s")).collect()
    assert cat[0]["n_expected"] == 1 and cat[0]["n_actual"] == 1


def test_categorical_drift_detects_dropped_category(spark):
    """An SDK release drops event type 'c' from the actual period:
    'c' must carry the dominant contribution."""
    from optiprism_spark.operators.drift import categorical_drift

    exp = spark.range(9_000).select(
        F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                     (F.col("id") % 3 + 1).cast("int")).alias("cat"),
        F.lit(True).alias("s"))
    act = spark.range(9_000).select(
        F.element_at(F.array(F.lit("a"), F.lit("b")),
                     (F.col("id") % 2 + 1).cast("int")).alias("cat"),
        F.lit(False).alias("s"))
    rows = {r["category"]: r for r in categorical_drift(
        exp.unionByName(act), "cat", split=F.col("s")).collect()}
    assert rows["c"]["n_actual"] == 0 and rows["c"]["n_expected"] == 3000
    assert rows["c"]["psi_contrib"] == max(
        r["psi_contrib"] for r in rows.values())
    assert rows["c"]["psi_contrib"] > 1.0  # way past the 0.25 alarm


def test_streaming_drift_alerts_end_to_end(spark, tmp_path):
    """Drift watchdog: a same-mix batch raises nothing; a shifted
    batch raises exactly one alert; a replayed/quiet pass re-raises
    nothing (per-batch overwrite + anti-join idempotence)."""
    import os

    from optiprism_spark.streaming.alerts import streaming_drift_alerts

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import datetime as dt

    def mk(ev, n, base_id):
        return [(base_id + i, dt.datetime(2024, 1, 2, 10, 0, 0), i % 9,
                 ev, 0.0, "{}") for i in range(n)]

    baseline = spark.createDataFrame(
        mk("a", 300, 0) + mk("b", 300, 1000) + mk("c", 300, 2000), schema)
    src = str(tmp_path / "landing"); os.makedirs(src)
    state = str(tmp_path / "state")
    log = str(tmp_path / "alerts")

    def run():
        q = streaming_drift_alerts(
            spark, spark.createDataFrame([], schema).schema, src, baseline,
            str(tmp_path / "ckpt"), state, log, threshold=0.25)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # batch 1: same mix → PSI ~0, no alert
    spark.createDataFrame(
        mk("a", 100, 10_000) + mk("b", 100, 11_000) + mk("c", 100, 12_000),
        schema).coalesce(1).write.mode("append").parquet(src)
    run()
    assert not os.path.isdir(log) or spark.read.parquet(log).count() == 0

    # batch 2: the mix collapses to one event type → alert
    spark.createDataFrame(mk("a", 3000, 20_000), schema).coalesce(
        1).write.mode("append").parquet(src)
    run()
    alerts = spark.read.parquet(log).collect()
    assert len(alerts) == 1 and alerts[0]["psi"] >= 0.25

    # quiet re-run: nothing new lands, log unchanged
    run()
    assert spark.read.parquet(log).count() == 1
