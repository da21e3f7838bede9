"""Histogram-percentile rollup: error bounded by bin width, bins
mergeable (incremental ≡ rebuild), estimator edge cases."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from optiprism_spark.rollup import (
    RollupSpec,
    build_rollup,
    merge_rollups,
    percentile_estimate,
)
from optiprism_spark.schema import load_table

SF = "/root/testdata/sf0.01"
EDGES = (1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0)
SPEC = RollupSpec(histogram_props=(("value", EDGES),))


def test_estimate_error_bounded_by_bin_width(spark):
    events = load_table(spark, SF, "events").filter(
        F.col("event_type") == "purchase")
    rollup = build_rollup(events, SPEC)
    est = percentile_estimate(rollup, SPEC, "value", (0.5, 0.9)).collect()[0]
    exact = events.agg(
        F.expr("percentile(value, 0.5)"), F.expr("percentile(value, 0.9)")
    ).collect()[0]
    for q, got, true in ((0.5, est["p50_est"], exact[0]),
                         (0.9, est["p90_est"], exact[1])):
        # the true percentile's enclosing bin bounds the error
        lo = max([e for e in EDGES if e <= true], default=EDGES[0])
        hi = min([e for e in EDGES if e > true], default=EDGES[-1])
        assert abs(got - true) <= (hi - lo), (q, got, true)


def test_histogram_bins_merge_exactly(spark):
    """Split-build-merge ≡ single build, bin for bin — the property
    that lets the incremental maintenance loop carry percentiles."""
    events = load_table(spark, SF, "events")
    full = build_rollup(events, SPEC)
    a = build_rollup(events.filter(F.col("event_id") % 2 == 0), SPEC)
    b = build_rollup(events.filter(F.col("event_id") % 2 == 1), SPEC)
    merged = merge_rollups([a, b], SPEC)
    cols = ["dt", "event_type"] + [SPEC.hist_col("value", i)
                                   for i in range(len(EDGES) + 1)]
    assert sorted(map(tuple, full.select(cols).collect())) == sorted(
        map(tuple, merged.select(cols).collect()))


def test_estimator_edges(spark):
    """All mass below the lowest edge clamps to it; above the highest
    clamps there; empty series yields NULL."""
    rows = [(dt.date(2024, 1, 1), "a", 0.5), (dt.date(2024, 1, 1), "a", 0.2),
            (dt.date(2024, 1, 1), "b", 900.0)]
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 1), 1, t, v, "{}")
         for i, (_, t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    rollup = build_rollup(df, SPEC)
    out = {r["event_type"]: r for r in
           percentile_estimate(rollup, SPEC, "value", (0.5,),
                               dims=("event_type",)).collect()}
    assert out["a"]["p50_est"] == EDGES[0]
    assert out["b"]["p50_est"] == EDGES[-1]

    empty = percentile_estimate(
        build_rollup(df.filter(F.lit(False)), SPEC), SPEC, "value", (0.5,))
    row = empty.collect()[0]
    assert row["n"] is None or row["n"] == 0  # global agg over nothing


def test_percentiles_http_product_loop(spark, tmp_path):
    """Declare a histogram rollup through the schema CRUD, then read
    percentile estimates from POST /queries/percentiles — matching
    the directly-run estimator; bad declarations and reads 4xx."""
    from optiprism_spark.server import make_app
    from tests.test_server import call

    app = make_app(spark, SF, rollup_dir=str(tmp_path / "rollups"))

    st, _ = call(app, "POST", "/api/v1/projects/1/schema/rollups",
                 {"name": "hbad", "histogramProps": [["value", [5, 5, 1]]]})
    assert st == 400

    st, _ = call(app, "POST", "/api/v1/projects/1/schema/rollups",
                 {"name": "hist", "dims": ["event_type"],
                  "histogramProps": [["value", list(EDGES)]]})
    assert st == 201

    st, payload = call(app, "POST", "/api/v1/projects/1/queries/percentiles",
                       {"rollup": "hist", "property": "value",
                        "qs": [0.5, 0.9], "dims": ["event_type"]})
    assert st == 200
    cols = {c["name"]: c["data"] for c in payload["columns"]}
    from optiprism_spark.rollup import RollupStore

    store = RollupStore(str(tmp_path / "rollups" / "p1_hist"),
                        RollupSpec(histogram_props=(("value", EDGES),)))
    direct = percentile_estimate(
        store.read(spark), store.spec, "value", (0.5, 0.9),
        dims=("event_type",)).collect()
    assert sorted(zip(cols["event_type"], cols["p50_est"], cols["p90_est"])) \
        == sorted((r.event_type, r.p50_est, r.p90_est) for r in direct)

    st, _ = call(app, "POST", "/api/v1/projects/1/queries/percentiles",
                 {"rollup": "hist", "property": "nope"})
    assert st == 400
    st, _ = call(app, "POST", "/api/v1/projects/1/queries/percentiles",
                 {"rollup": "missing", "property": "value"})
    assert st == 404
    st, _ = call(app, "POST", "/api/v1/projects/1/queries/percentiles",
                 {"rollup": "hist", "property": "value", "qs": [1.5]})
    assert st == 400
