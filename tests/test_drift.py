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


# -------------------------------------------------- r12: serving + rollup

_JAN_B = {"type": "between", "from": "2024-01-01T00:00:00",
          "to": "2024-01-15T23:59:59.999999"}
_JAN_A = {"type": "between", "from": "2024-01-16T00:00:00",
          "to": "2024-01-31T23:59:59.999999"}
_EDGES = [1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0]


def test_http_drift_routes_through_rollup(spark, tmp_path):
    """POST /queries/drift: raw fixed-edge PSI without a store,
    folded from a declared rollup's stored histogram bins once one
    exists (IDENTICAL response — routed ≡ raw is bit-equality, not
    approximation), raw fallback on ragged bounds; every decision in
    the rollup metric. The r11 verdict's Missing #1."""
    from optiprism_spark import metrics
    from optiprism_spark.server import make_app

    from .test_server import call

    metrics.REGISTRY.reset()
    app = make_app(spark, SF_SMOKE, rollup_dir=str(tmp_path / "rollups"),
                   result_cache_ttl=None)
    url = "/api/v1/projects/1/queries/drift"
    body = {"type": "numeric", "property": "value",
            "baseline": _JAN_B, "actual": _JAN_A, "edges": _EDGES}
    st, raw_resp = call(app, "POST", url, body)
    assert st == 200
    assert metrics.query_rollup_routed_total().value(path="rollup") == 0

    st, _ = call(app, "POST", "/api/v1/projects/1/schema/rollups",
                 {"name": "dq", "dims": ["event_type"],
                  "histogramProps": [["value", _EDGES]]})
    assert st == 201
    st, routed_resp = call(app, "POST", url, body)
    assert st == 200
    assert metrics.query_rollup_routed_total().value(path="rollup") == 1
    assert routed_resp == raw_resp  # bit-equality, stored bins ≡ raw scan

    # categorical mix folds from the same store's per-dim day counts
    cat = {"type": "categorical", "property": "event_type",
           "baseline": _JAN_B, "actual": _JAN_A}
    st, routed_cat = call(app, "POST", url, cat)
    assert st == 200
    assert metrics.query_rollup_routed_total().value(path="rollup") == 2

    # ragged bounds: not day-aligned -> raw scan answers
    ragged = dict(body, baseline={"type": "between",
                                  "from": "2024-01-01T12:00:00",
                                  "to": "2024-01-15T23:59:59.999999"})
    st, _ = call(app, "POST", url, ragged)
    assert st == 200
    assert metrics.query_rollup_routed_total().value(path="rollup") == 2

    # explicit bins (global min/max) never routes — bounds depend on rows
    st, _ = call(app, "POST", url,
                 {"type": "numeric", "property": "value",
                  "baseline": _JAN_B, "actual": _JAN_A, "bins": 10})
    assert st == 200
    assert metrics.query_rollup_routed_total().value(path="rollup") == 2

    # overlapping periods are a caller error, not a silent wrong PSI
    st, _ = call(app, "POST", url, dict(body, actual=_JAN_B))
    assert st == 400


def test_http_drift_profile_and_rbac(spark):
    """The profile flavour serves through the same route with the
    explore permission; a viewer-forbidden project 401s like every
    other query family (RBAC comes from the shared route table)."""
    from optiprism_spark.server import make_app

    from .test_server import call

    app = make_app(spark, SF_SMOKE, result_cache_ttl=None)
    url = "/api/v1/projects/1/queries/drift"
    body = {"type": "profile", "columns": ["value"], "by": ["event_type"],
            "time": {"type": "between", "from": "2024-01-01T00:00:00",
                     "to": "2024-01-31T23:59:59"}}
    st, payload = call(app, "POST", url, body)
    assert st == 200
    names = [c["name"] for c in payload["columns"]]
    assert {"event_type", "n_rows", "value_nulls", "value_mean",
            "value_distinct"} <= set(names)
    # approxDistinct swaps the Expand for HLL++ — still one scan,
    # same shape, estimate within HLL tolerance at this cardinality
    st2, approx = call(app, "POST", url, dict(body, approxDistinct=True))
    assert st2 == 200
    exact = {c["name"]: c["data"] for c in payload["columns"]}
    est = {c["name"]: c["data"] for c in approx["columns"]}
    for a, b in zip(exact["value_distinct"], est["value_distinct"]):
        # default HLL++ rsd is 0.05 (1σ) — gate at 4σ so the test
        # checks "is an estimate of the right thing", not HLL luck
        assert abs(a - b) <= max(3.0, 0.2 * a)
    # unknown column -> 400, not a Spark analysis stack trace
    st3, _ = call(app, "POST", url, dict(body, columns=["nope"]))
    assert st3 == 400


def test_categorical_guard_bounds_high_cardinality(spark):
    """Point categorical_drift at a ~20k-distinct column: the output
    is exactly K kept categories + __other__, the PSI stays finite,
    and mass is conserved (kept + tail == population)."""
    from optiprism_spark.operators.drift import (
        OTHER_CATEGORY, categorical_drift)

    df = spark.range(40_000).select(
        F.concat(F.lit("url_"), (F.col("id") % 20_000).cast("string"))
        .alias("u"),
        (F.col("id") < 20_000).alias("s"),
    )
    out = categorical_drift(df, "u", F.col("s"), max_categories=50)
    rows = out.collect()
    assert len(rows) == 51
    cats = {r["category"] for r in rows}
    assert OTHER_CATEGORY in cats
    assert all(r["psi_contrib"] is not None for r in rows)
    assert sum(r["n_expected"] + r["n_actual"] for r in rows) == 40_000


def test_rollup_psi_fold_shape(spark):
    """The routed PSI's plan touches the ROLLUP store only — no
    events scan, no window, one aggregation into a stack unpivot."""
    import datetime as dt

    from optiprism_spark.dsl import QueryTime
    from optiprism_spark.rollup import (
        RollupSpec, build_rollup, psi_from_rollup)
    from optiprism_spark.schema import load_table

    events = load_table(spark, SF_SMOKE, "events")
    spec = RollupSpec(histogram_props=(("value", tuple(_EDGES)),))
    rollup = build_rollup(events, spec).localCheckpoint()
    base = QueryTime.between(
        dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 15, 23, 59, 59, 999999))
    act = QueryTime.between(
        dt.datetime(2024, 1, 16), dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
    out = psi_from_rollup(rollup, spec, "value", base, act)
    plan = _plan(out)
    assert "FileScan parquet" not in plan, plan  # no raw-event rescan
    assert "Window" not in plan, plan
    assert plan.lower().count("generate") <= 1  # the stack unpivot
    assert out.count() == len(_EDGES) + 1


def test_drift_watchdog_rebaseline(spark, tmp_path):
    """The operator action after an ACCEPTED shift: alert fires on
    the new mix, rebaseline accepts it, subsequent same-new-mix
    batches stay quiet (the r11 frozen-baseline alarm loop), a RE-
    shift from the new baseline alerts again, and replays stay
    idempotent throughout — all without touching the checkpoint."""
    import datetime as dt
    import os

    from optiprism_spark.streaming.alerts import (
        rebaseline_drift_alerts, streaming_drift_alerts)

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

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

    # the mix legitimately collapses to one event type → alert fires
    spark.createDataFrame(mk("a", 3000, 20_000), schema).coalesce(
        1).write.mode("append").parquet(src)
    run()
    assert spark.read.parquet(log).count() == 1
    # without rebaseline the alarm would ring on EVERY next batch of
    # the accepted mix; the operator accepts what was observed
    marker = rebaseline_drift_alerts(spark, state)
    assert marker["from_batch"] >= 0

    spark.createDataFrame(mk("a", 500, 40_000), schema).coalesce(
        1).write.mode("append").parquet(src)
    run()
    assert spark.read.parquet(log).count() == 1  # quiet: mix accepted

    # replay idempotence survives the marker flip
    run()
    assert spark.read.parquet(log).count() == 1

    # drifting away from the NEW baseline alerts again
    spark.createDataFrame(mk("z", 3000, 60_000), schema).coalesce(
        1).write.mode("append").parquet(src)
    run()
    alerts = {r["batch_id"]: r["psi"] for r in
              spark.read.parquet(log).collect()}
    assert len(alerts) == 2


# --------------------------------------------- r12: equi-depth PSI bins


def test_quantile_psi_equal_depth_and_validation(spark):
    """Identical populations -> each decile bin holds ~1/n of both
    sides and the PSI is ~0; the baseline's own deciles define the
    edges (equi-depth), unlike equal-width bins."""
    from pyspark.sql import Row

    from optiprism_spark.operators.drift import distribution_drift_quantile

    import datetime as dt

    rows = [Row(ts=dt.datetime(2024, 1, 2 + (i % 2)), value=float(i))
            for i in range(1000)]  # both halves uniform 0..999
    df = spark.createDataFrame(rows)
    out = distribution_drift_quantile(
        df, "value", split=F.dayofmonth("ts") == 2, n_bins=10).collect()
    assert len(out) == 10
    tot_e = sum(r.n_expected for r in out)
    for r in out:  # equi-depth: every bin ~10% of the baseline
        assert abs(r.n_expected / tot_e - 0.1) < 0.02
    assert abs(sum(r.psi_contrib for r in out)) < 0.01  # no drift
    with pytest.raises(ValueError, match="n_bins"):
        distribution_drift_quantile(df, "value", F.lit(True), n_bins=1)


def test_quantile_psi_point_mass_skips_bins(spark):
    """A heavy point mass collapses consecutive quantiles; duplicate
    edges skip bins rather than corrupting counts."""
    from pyspark.sql import Row

    import datetime as dt

    from optiprism_spark.operators.drift import distribution_drift_quantile

    rows = ([Row(ts=dt.datetime(2024, 1, 2), value=5.0)] * 800
            + [Row(ts=dt.datetime(2024, 1, 2), value=float(v))
               for v in range(100)]
            + [Row(ts=dt.datetime(2024, 1, 3), value=float(v % 50))
               for v in range(300)])
    df = spark.createDataFrame(rows)
    out = distribution_drift_quantile(
        df, "value", split=F.dayofmonth("ts") == 2, n_bins=10).collect()
    buckets = {r.bucket for r in out}
    assert len(buckets) < 10  # skipped bins from the duplicate edges
    assert sum(r.n_expected for r in out) == 900
    assert sum(r.n_actual for r in out) == 300


def test_http_drift_quantile_bins(spark):
    from optiprism_spark.server import make_app

    from .test_server import call

    app = make_app(spark, SF_SMOKE, result_cache_ttl=None)
    url = "/api/v1/projects/1/queries/drift"
    body = {"type": "numeric", "property": "value",
            "baseline": _JAN_B, "actual": _JAN_A, "quantileBins": 10}
    st, resp = call(app, "POST", url, body)
    assert st == 200
    buckets = next(c["data"] for c in resp["columns"]
                   if c["name"] == "bucket")
    assert 1 <= len(buckets) <= 10
    st, _ = call(app, "POST", url, dict(body, bins=5))
    assert st == 400  # mutually exclusive flavours


def test_http_drift_caller_errors_fail_loudly(spark):
    """ADVICE r12: ad-hoc `edges` must be strictly increasing (the
    rollup DDL path already enforced this — unsorted/duplicate edges
    make the fixed-bin conditions overlap and return a silently wrong
    PSI under HTTP 200), and `maxCategories` must be a positive int
    (a negative flowed into hist.limit(-N) → AnalysisException → 500).
    """
    import pytest

    from optiprism_spark.operators.drift import distribution_drift_fixed
    from optiprism_spark.server import make_app

    from .test_server import call

    app = make_app(spark, SF_SMOKE, result_cache_ttl=None)
    url = "/api/v1/projects/1/queries/drift"
    num = {"type": "numeric", "property": "value",
           "baseline": _JAN_B, "actual": _JAN_A}
    for bad in ([3.0, 1.0, 2.0], [1.0, 1.0, 2.0], ["a", "b"]):
        st, _ = call(app, "POST", url, dict(num, edges=bad))
        assert st == 400, f"edges={bad} must 400"
    st, _ = call(app, "POST", url, dict(num, edges=[1.0, 2.0, 3.0]))
    assert st == 200  # well-formed edges still serve
    cat = {"type": "categorical", "property": "event_type",
           "baseline": _JAN_B, "actual": _JAN_A}
    for bad in (-1, 0, "many"):
        st, _ = call(app, "POST", url, dict(cat, maxCategories=bad))
        assert st == 400, f"maxCategories={bad} must 400"
    st, _ = call(app, "POST", url, dict(cat, maxCategories=3))
    assert st == 200
    # the library entry point guards its own callers too
    from optiprism_spark.schema import load_table

    events = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="strictly increasing"):
        distribution_drift_fixed(
            events, "value", F.lit(True), [2.0, 1.0]).collect()


def test_embedding_centroid_drift_hand_computed(spark):
    """Identical halves -> cosine 1, L2 0; a translated half ->
    cosine < 1 with the exact L2 of the translation; groups are
    independent."""
    import pyspark.sql.functions as F

    from optiprism_spark.operators.drift import embedding_centroid_drift

    rows = []
    # label 0: current == reference (two identical vectors per half)
    for i, half in ((0, 0), (1, 1), (2, 0), (3, 1)):
        rows.append((i, [1.0, 2.0, 2.0], 0))
    # label 1: current shifted by (0, 3, 4) -> L2 = 5
    rows.append((10, [1.0, 0.0, 0.0], 1))   # ref
    rows.append((11, [1.0, 3.0, 4.0], 1))   # cur (odd id)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in embedding_centroid_drift(
        emb, current=(F.col("vec_id") % 2 == 1), dim=3, by="label"
    ).collect()}
    assert out[0]["n_ref"] == 2 and out[0]["n_cur"] == 2
    assert out[0]["centroid_cosine"] == 1.0
    assert out[0]["centroid_l2"] == 0.0
    assert out[1]["centroid_l2"] == 5.0
    import math
    exp_cos = 1.0 / math.sqrt(1 + 9 + 16)
    assert abs(out[1]["centroid_cosine"] - round(exp_cos, 9)) < 1e-12

    with pytest.raises(ValueError):
        embedding_centroid_drift(emb, current=F.lit(True), dim=0)


def test_embedding_centroid_drift_global(spark):
    """by=None: one global row via the constant-key broadcast pairing
    (the branch the per-label queries never touch)."""
    import pyspark.sql.functions as F

    from optiprism_spark.operators.drift import embedding_centroid_drift

    rows = [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0),
            (2, [1.0, 0.0], 1), (3, [0.0, 1.0], 1)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = embedding_centroid_drift(
        emb, current=(F.col("vec_id") % 2 == 1), dim=2).collect()
    assert len(out) == 1
    r = out[0]
    # ref centroid (1,0)+(1,0) avg=(1,0); cur (0,1)+(0,1) avg=(0,1)
    assert r["n_ref"] == 2 and r["n_cur"] == 2
    assert r["centroid_cosine"] == 0.0
    assert abs(r["centroid_l2"] - round(2 ** 0.5, 9)) < 1e-12
