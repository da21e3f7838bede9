"""Unified maintenance orchestrator (server.App.maintain, r15
verdict task 6): ONE tick advances every declared store exactly
once, replay-safe, with per-store advance metrics. The individual
hooks (maintain_rollups / maintain_user_day / maintain_ivf /
maintain_ann_indexes / gate_quality / sweep_sessions) stay public
for granular schedules — this file pins the orchestrated path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from optiprism_spark import metrics
from optiprism_spark.operators.ivf_store import IvfStore
from optiprism_spark.rollup import RollupSpec, RollupStore
from optiprism_spark.schema import load_table
from optiprism_spark.server import make_app
from optiprism_spark.streaming.audience import KmvDayStore
from optiprism_spark.userday import UserDayStore

SF = "/root/testdata/sf0.001"


def _event_batch(spark, day="2024-02-01"):
    """A small append batch shaped like the events table (one new
    day, deterministic rows)."""
    ev = load_table(spark, SF, "events")
    base = ev.orderBy("event_id").limit(50)
    shift = F.lit(day).cast("timestamp")
    return base.withColumn(
        "ts", F.to_timestamp(
            F.concat(F.lit(day + " "),
                     F.date_format("ts", "HH:mm:ss"))))


def test_unified_tick_advances_every_store_once(spark, tmp_path):
    metrics.REGISTRY.reset()
    ev = load_table(spark, SF, "events")
    emb = load_table(spark, SF, "embeddings")

    rollup = RollupStore(str(tmp_path / "rollup"), RollupSpec())
    rollup.rebuild(spark, ev)
    userday = UserDayStore(str(tmp_path / "userday"))
    userday.rebuild(spark, ev)
    kmv = KmvDayStore(str(tmp_path / "kmv"), k=64)
    kmv.update(spark, ev)  # seed the sketch store
    ivf = IvfStore(str(tmp_path / "ivf"))
    ivf.rebuild(spark, emb, n_centroids=4)

    app = make_app(spark, SF, result_cache_ttl=None,
                   rollup_store=rollup, user_day_store=userday,
                   kmv_store=kmv, ivf_store=ivf,
                   ivf_dir=str(tmp_path / "ann"),
                   wal_dir=str(tmp_path / "wal"), session_store=True)
    from .test_server import call

    # one declared ANN index and one declared quality battery take
    # part in the same tick
    st, _ = call(app, "POST", "/api/v1/projects/0/schema/ann-indexes",
                 {"name": "main", "nCentroids": 4})
    assert st == 202 and app.wait_ann_builds()
    st, _ = call(app, "POST", "/api/v1/projects/0/schema/quality-checks",
                 {"name": "ids", "constraints": [
                     {"type": "completeness", "column": "user_id"}]})
    assert st == 201

    batch = _event_batch(spark)
    emb_batch = spark.createDataFrame(
        [(50_000 + i, [float(i + 1)] * 64) for i in range(3)],
        "vec_id long, embedding array<float>")

    ud_days_before = userday.read(spark).select("dt").distinct().count()
    ivf_count_before = ivf.info()["count"]

    out = app.maintain(batch, emb_batch, stream_id="tick", batch_id=1)

    # every tier moved exactly once
    assert out["quality_failures"] == []  # batch is clean
    assert out["rollup_stores"] == 1
    assert out["user_day_days"] == 1  # the one shifted day
    assert out["kmv_days"] == 1
    assert out["ann_stores"] == 2  # declared 'main' + app-level store
    assert out["sessions_ended"] == 0
    assert userday.read(spark).select("dt").distinct().count() == \
        ud_days_before + 1
    assert ivf.info()["count"] == ivf_count_before + 3

    adv = metrics.maintenance_store_advanced_total()
    assert adv.value(store="rollup") == 1
    assert adv.value(store="user_day") == 1
    assert adv.value(store="kmv") == 1
    assert adv.value(store="ann") == 2

    # replay: the SAME (stream_id, batch_id) re-delivered — ledgered
    # stores no-op, merge-idempotent stores keep identical data
    ud_snap = sorted(
        tuple(r) for r in userday.read(spark).collect())
    out2 = app.maintain(batch, emb_batch, stream_id="tick", batch_id=1)
    assert out2["user_day_days"] == 0  # ledger no-op
    assert ivf.info()["count"] == ivf_count_before + 3  # ledger no-op
    assert sorted(tuple(r) for r in userday.read(spark).collect()) == \
        ud_snap
    # rollup/KMV merges are idempotent at day grain: counts unchanged
    # (rollup day rows for the batch's day fold to the same values)
    assert out2["rollup_stores"] == 1  # touched, but a no-op merge


def test_unified_tick_reports_quality_failures(spark, tmp_path):
    """A failing declared battery surfaces in the tick's summary and
    metric — the 'vendor broke the feed' alarm fires from the same
    orchestrator call that advances the stores."""
    metrics.REGISTRY.reset()
    app = make_app(spark, SF, result_cache_ttl=None)
    from .test_server import call

    st, _ = call(app, "POST", "/api/v1/projects/0/schema/quality-checks",
                 {"name": "ids", "constraints": [
                     {"type": "completeness", "column": "user_id"}]})
    assert st == 201
    bad = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 2.0)],
        "event_id long, user_id long, value double")
    out = app.maintain(bad)
    assert [f["constraint"] for f in out["quality_failures"]] == [
        "completeness(user_id)"]
    assert metrics.maintenance_store_advanced_total().value(
        store="quality_gate") == 1
    # nothing else configured: every other tier reports zero
    assert out["rollup_stores"] == 0 and out["ann_stores"] == 0
    assert out["user_day_days"] == 0 and out["kmv_days"] == 0
