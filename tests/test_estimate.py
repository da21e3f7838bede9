"""Sampled-estimation semantics: coherence, scaling rules, accuracy
vs ground truth (the oracle suite proves determinism; this proves the
statistics are sane and the sample is user-coherent)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from optiprism_spark.dsl import (
    AggFn, EventQuery, EventRef, EventSegmentationRequest, PropertyRef,
    QueryTime, SegQuery, TimeIntervalUnit,
)
from optiprism_spark.operators.estimate import (
    estimated_event_segmentation, rel_err_hint, user_sample,
)
from optiprism_spark.schema import load_table

SF = "/root/testdata/sf0.01"
WINDOW = QueryTime.between(dt.datetime(2024, 1, 1),
                           dt.datetime(2024, 1, 31, 23, 59, 59))


def test_sample_is_user_coherent(spark):
    """A kept user keeps ALL their events — the property every
    sequence/distinct metric depends on."""
    events = load_table(spark, SF, "events")
    sampled = user_sample(events, 0.25)
    kept = sampled.select("user_id").distinct()
    full_counts = events.join(kept, "user_id").groupBy("user_id").count()
    sample_counts = sampled.groupBy("user_id").count()
    diff = (
        full_counts.alias("f")
        .join(sample_counts.alias("s"), "user_id")
        .filter(F.col("f.count") != F.col("s.count"))
        .count()
    )
    assert diff == 0


def test_sample_membership_stable_under_growth(spark):
    """Appending events never changes who is in the sample (hash
    threshold on the user, not on position or partitioning)."""
    events = load_table(spark, SF, "events")
    half = events.filter(F.col("event_id") % 2 == 0)
    u_half = {r[0] for r in user_sample(half, 0.25)
              .select("user_id").distinct().collect()}
    u_full = {r[0] for r in user_sample(events, 0.25)
              .select("user_id").distinct().collect()}
    half_users = {r[0] for r in half.select("user_id").distinct().collect()}
    assert u_half == {u for u in u_full if u in half_users}


def test_estimate_accuracy_and_scaling(spark):
    """25% sample: scaled monthly totals land within the binomial
    error bound of ground truth; AVG passes through unscaled."""
    events = load_table(spark, SF, "events")
    req = EventSegmentationRequest(
        time=WINDOW, interval=TimeIntervalUnit.MONTH,
        events=[EventQuery(
            EventRef("purchase"),
            [
                SegQuery("count_events", alias="n_est"),
                SegQuery("count_unique_groups", alias="u_est"),
                SegQuery("aggregate_property", agg=AggFn.AVG,
                         prop=PropertyRef.column("value"), alias="aov"),
            ],
        )],
    )
    est = estimated_event_segmentation(events, req, 0.25).collect()[0]
    truth = events.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-01"))
        & (F.col("ts") <= F.lit("2024-01-31 23:59:59"))
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("u"),
        F.avg("value").alias("aov"),
    ).collect()[0]

    sampled_users = int(round(est["u_est"] * 0.25))
    bound = rel_err_hint(0.25, sampled_users, confidence_z=4.0)
    assert bound is not None and bound < 1.0
    assert abs(est["u_est"] - truth["u"]) / truth["u"] <= bound
    assert abs(est["n_est"] - truth["n"]) / truth["n"] <= 2 * bound
    # AVG is a ratio estimate: unscaled, and near truth
    assert est["aov"] == pytest.approx(truth["aov"], rel=0.25)


def test_rate_one_is_exact_passthrough(spark):
    events = load_table(spark, SF, "events")
    req = EventSegmentationRequest(
        time=WINDOW, interval=TimeIntervalUnit.MONTH,
        events=[EventQuery(EventRef("view"),
                           [SegQuery("count_events", alias="n")])],
    )
    exact = estimated_event_segmentation(events, req, 1.0).collect()
    from optiprism_spark.queries.event_segmentation import run_event_segmentation
    base = run_event_segmentation(events, req).collect()
    assert [(r["bucket"], float(r["n"])) for r in exact] == [
        (r["bucket"], float(r["n"])) for r in base]


def test_sample_predicate_is_pre_shuffle(spark):
    """The md5 filter sits below the aggregation exchange, so every
    shuffle moves only the sampled fraction."""
    events = load_table(spark, SF, "events")
    req = EventSegmentationRequest(
        time=WINDOW, interval=TimeIntervalUnit.DAY,
        events=[EventQuery(EventRef(), [SegQuery("count_events", alias="n")])],
    )
    df = estimated_event_segmentation(events, req, 0.25)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exch = plan.index("Exchange")
    assert "md5" in plan[exch:], plan  # filter below the first exchange


def test_bad_rate_rejected(spark):
    events = load_table(spark, SF, "events")
    for rate in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            user_sample(events, rate)


def test_rel_err_hint_edges():
    assert rel_err_hint(0.25, 0) is None
    assert rel_err_hint(1.0, 100) == 0.0
    # shrinks with more users, grows as rate drops
    assert rel_err_hint(0.25, 10000) < rel_err_hint(0.25, 100)
    assert rel_err_hint(0.01, 100) > rel_err_hint(0.5, 100)


def test_estimated_funnel_scaling_rules(spark):
    """Sampled funnel: totals are the sampled funnel's totals × 1/rate;
    ratio and avg columns pass through bit-identical."""
    from optiprism_spark.dsl import (
        EventFilterSpec, EventRef, FunnelRequest, FunnelStep, TimeIntervalUnit,
    )
    from optiprism_spark.operators.estimate import (
        estimated_funnel_report, user_sample,
    )
    from optiprism_spark.operators.funnel import funnel_report

    events = load_table(spark, SF, "events")
    req = FunnelRequest(
        time=WINDOW, interval=TimeIntervalUnit.WEEK,
        steps=[
            FunnelStep([EventFilterSpec(EventRef("signup"))]),
            FunnelStep([EventFilterSpec(EventRef("view"))]),
            FunnelStep([EventFilterSpec(EventRef("purchase"))]),
        ],
        window_ms=7 * 86_400_000,
    )
    est = {r["bucket"]: r for r in
           estimated_funnel_report(events, req, 0.25).collect()}
    raw = {r["bucket"]: r for r in
           funnel_report(user_sample(events, 0.25), req).collect()}
    assert set(est) == set(raw) and est
    for b, e in est.items():
        r = raw[b]
        assert e["total"] == r["total"] * 4.0
        assert e["step2_total"] == r["step2_total"] * 4.0
        assert e["step2_conversion_ratio"] == r["step2_conversion_ratio"]
        assert e["step2_avg_time_to_convert"] == r["step2_avg_time_to_convert"]


def test_count_aggregates_scale_too(spark):
    """COUNT-family aggregateProperty metrics are additive totals and
    must scale by 1/rate (review finding: they silently passed
    through unscaled)."""
    events = load_table(spark, SF, "events")
    req = EventSegmentationRequest(
        time=WINDOW, interval=TimeIntervalUnit.MONTH,
        events=[EventQuery(
            EventRef("purchase"),
            [SegQuery("aggregate_property", agg=AggFn.COUNT,
                      prop=PropertyRef.column("value"), alias="nv")],
        )],
    )
    est = estimated_event_segmentation(events, req, 0.25).collect()[0]
    from optiprism_spark.queries.event_segmentation import run_event_segmentation
    sampled = run_event_segmentation(user_sample(events, 0.25), req).collect()[0]
    assert est["nv"] == sampled["nv"] * 4.0


def test_rate_one_keeps_dtypes(spark):
    """rate=1.0 is a true passthrough: no scaling AND no dtype change
    (longs stay longs)."""
    events = load_table(spark, SF, "events")
    req = EventSegmentationRequest(
        time=WINDOW, interval=TimeIntervalUnit.MONTH,
        events=[EventQuery(EventRef("view"),
                           [SegQuery("count_events", alias="n")])],
    )
    exact = estimated_event_segmentation(events, req, 1.0)
    assert dict(exact.dtypes)["n"] == "bigint"


def test_sampled_funnel_respects_group_col(spark):
    """The sample unit follows the funnel's group column — sampling
    user_id while partitioning by another entity would hand the
    machine truncated streams (review finding)."""
    from optiprism_spark.dsl import (
        EventFilterSpec, EventRef, FunnelRequest, FunnelStep, TimeIntervalUnit,
    )
    from optiprism_spark.operators.estimate import estimated_funnel_report
    from optiprism_spark.operators.funnel import funnel_report

    events = load_table(spark, SF, "events").withColumn(
        "org_id", F.col("user_id") % 37)
    req = FunnelRequest(
        time=WINDOW, interval=TimeIntervalUnit.MONTH,
        steps=[FunnelStep([EventFilterSpec(EventRef("view"))]),
               FunnelStep([EventFilterSpec(EventRef("purchase"))])],
        window_ms=7 * 86_400_000, group_col="org_id",
    )
    est = {r["bucket"]: r for r in
           estimated_funnel_report(events, req, 0.25).collect()}
    raw = {r["bucket"]: r for r in funnel_report(
        user_sample(events, 0.25, group_col="org_id"), req).collect()}
    assert set(est) == set(raw) and est
    for b in est:
        assert est[b]["total"] == raw[b]["total"] * 4.0


def test_estimated_growth_accuracy_and_scaling(spark):
    """25% coherent sample: per-bucket scaled ledger counts land near
    ground truth (coherence keeps each kept user's classification
    exact — only the WHO is thinned, never the timeline); rate=1 is
    an exact long-typed passthrough."""
    from optiprism_spark.dsl import TimeIntervalUnit
    from optiprism_spark.operators.engagement import growth_accounting
    from optiprism_spark.operators.estimate import (
        estimated_growth_accounting,
    )

    events = load_table(spark, SF, "events")
    kw = dict(time=WINDOW, period=TimeIntervalUnit.WEEK)
    est = {str(r["bucket"]): r for r in
           estimated_growth_accounting(events, 0.25, **kw).collect()}
    truth = {str(r["bucket"]): r for r in
             growth_accounting(events, **kw).collect()}
    assert set(est) == set(truth)
    for b in truth:
        for c in ("new_users", "active_users", "churned_users"):
            t = truth[b][c]
            if t >= 40:  # enough mass for the binomial bound to bite
                bound = rel_err_hint(0.25, int(round(est[b][c] * 0.25)),
                                     confidence_z=4.0)
                assert abs(est[b][c] - t) / t <= bound, (b, c, est[b][c], t)

    exact = estimated_growth_accounting(events, 1.0, **kw).collect()
    assert sorted(map(str, exact)) == sorted(
        map(str, growth_accounting(events, **kw).collect()))
