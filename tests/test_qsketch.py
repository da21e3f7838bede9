"""Mergeable quantile sketch (operators/qsketch.py): rank-error
bounds vs exact percentiles, exact weight preservation, byte
determinism, merge ≈ whole, rollup-store maintenance flow, and the
HTTP method=sketch percentile surface."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from optiprism_spark.operators.qsketch import (
    QuantileSketch,
    sketch_percentile_estimate,
)
from optiprism_spark.rollup import RollupSpec, RollupStore, build_rollup, merge_rollups
from optiprism_spark.schema import load_table

SF_DIR = "/root/testdata/sf0.001"
QS = (0.1, 0.5, 0.9)
#: generous vs the ~0.7% observed at k=200 — fails loudly on a real
#: regression, never on distribution luck
EPS = 0.02


def _rank_err(sorted_vals: np.ndarray, est: float, q: float) -> float:
    """Tie-aware rank error: distance from q to the estimate's rank
    INTERVAL [left, right] (duplicated mass makes a point rank
    meaningless)."""
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left") / n
    hi = np.searchsorted(sorted_vals, est, side="right") / n
    return max(0.0, lo - q, q - hi)


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "zipf"])
def test_rank_error_bound(dist):
    rng = np.random.default_rng(11)
    data = {
        "lognormal": lambda: rng.lognormal(3, 1.5, 400_000),
        "uniform": lambda: rng.uniform(0, 1000, 400_000),
        "zipf": lambda: rng.zipf(1.5, 400_000).astype(float),
    }[dist]()
    sk = QuantileSketch.from_values(data, 200)
    assert sk.total_weight == len(data)  # compaction preserves weight
    s = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        assert _rank_err(s, sk.quantile(q), q) <= EPS, (dist, q)


def test_merge_of_parts_matches_whole_within_bound():
    rng = np.random.default_rng(5)
    data = rng.lognormal(2, 1.0, 300_000)
    parts = np.array_split(data, 41)
    merged = QuantileSketch.merge_all(
        [QuantileSketch.from_values(p, 200) for p in parts], 200)
    assert merged.total_weight == len(data)
    s = np.sort(data)
    for q in QS:
        assert _rank_err(s, merged.quantile(q), q) <= EPS


def test_bytes_deterministic_and_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.normal(0, 1, 100_000)
    b1 = QuantileSketch.from_values(data, 200).to_bytes()
    # same multiset, different order -> identical bytes
    b2 = QuantileSketch.from_values(
        np.random.default_rng(9).permutation(data), 200).to_bytes()
    assert b1 == b2
    rt = QuantileSketch.from_bytes(b1)
    assert rt.total_weight == len(data)
    assert rt.quantiles(QS) == QuantileSketch.from_values(data, 200).quantiles(QS)


def test_empty_and_tiny_sketches():
    assert QuantileSketch.from_values([], 200).quantile(0.5) is None
    one = QuantileSketch.from_values([42.0], 200)
    assert one.total_weight == 1 and one.quantile(0.5) == 42.0
    with pytest.raises(ValueError):
        QuantileSketch.from_bytes(b"garbage")


SPEC = RollupSpec(sketch_props=("value",))
T_DAYS = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59, 999999)


def _exact_sorted(events, event_type=None):
    df = events
    if event_type:
        df = df.filter(F.col("event_type") == event_type)
    return np.sort(np.array(
        [r[0] for r in df.select("value").dropna().collect()]))


def test_rollup_sketch_column_estimates_within_bound(spark):
    """build_rollup carries a {p}_qsk binary per (dt, dims) cell;
    sketch_percentile_estimate folds them to dims grain with exact n
    and rank-bounded quantiles vs the raw data."""
    events = load_table(spark, SF_DIR, "events")
    roll = build_rollup(events, SPEC)
    est = sketch_percentile_estimate(
        roll, SPEC, "value", QS, dims=("event_type",))
    rows = {r["event_type"]: r for r in est.collect()}
    for et in ("purchase", "view"):
        s = _exact_sorted(events, et)
        assert rows[et]["n"] == len(s)  # weight is exact
        for q in QS:
            e = rows[et][f"p{int(q * 100)}_est"]
            assert _rank_err(s, e, q) <= EPS, (et, q)


def test_store_maintenance_merges_sketches(spark, tmp_path):
    """The sketch column flows through RollupStore.rebuild + update
    (merge_rollups): incremental maintenance over a split lake equals
    one build within the error bound, with exact total weight."""
    events = load_table(spark, SF_DIR, "events")
    first, second = (
        events.filter(F.dayofmonth("ts") <= 20),
        events.filter(F.dayofmonth("ts") > 20),
    )
    store = RollupStore(str(tmp_path / "r"), SPEC)
    store.rebuild(spark, first)
    # update a batch that OVERLAPS existing days to force the
    # merge_rollups sketch path (same-day cells union)
    overlap = events.filter(F.dayofmonth("ts").between(18, 31))
    store2 = RollupStore(str(tmp_path / "r2"), SPEC)
    store2.rebuild(spark, events.filter(F.dayofmonth("ts") <= 17))
    assert store2.update(spark, events.filter(F.dayofmonth("ts") > 17)) > 0
    est = sketch_percentile_estimate(
        store2.read(spark), SPEC, "value", QS, dims=())
    row = est.collect()[0]
    s = _exact_sorted(events)
    assert row["n"] == len(s)
    for q in QS:
        assert _rank_err(s, row[f"p{int(q * 100)}_est"], q) <= EPS
    # merge_rollups directly: day-split parts re-merge losslessly in n
    merged = merge_rollups([build_rollup(first, SPEC),
                            build_rollup(second, SPEC)], SPEC)
    est2 = sketch_percentile_estimate(merged, SPEC, "value", QS, dims=())
    assert est2.collect()[0]["n"] == len(s)


def test_http_sketch_percentiles(spark, tmp_path):
    from optiprism_spark.server import make_app

    from .test_server import call

    app = make_app(spark, SF_DIR, rollup_dir=str(tmp_path / "rollups"))
    st, _ = call(app, "POST", "/api/v1/projects/1/schema/rollups", {
        "name": "sk", "dims": ["event_type"], "sketchProps": ["value"],
    })
    assert st == 201
    st, resp = call(app, "POST", "/api/v1/projects/1/queries/percentiles", {
        "rollup": "sk", "property": "value", "method": "sketch",
        "qs": [0.5, 0.9], "dims": ["event_type"],
    })
    assert st == 200
    cols = {c["name"]: c["data"] for c in resp["columns"]}
    assert set(cols) == {"event_type", "n", "p50_est", "p90_est"}
    assert all(n > 0 for n in cols["n"])
    assert all(
        p50 <= p90 for p50, p90 in zip(cols["p50_est"], cols["p90_est"]))
    # sketch method on a prop without a declared sketch: 400
    st, _ = call(app, "POST", "/api/v1/projects/1/queries/percentiles", {
        "rollup": "sk", "property": "user_id", "method": "sketch",
    })
    assert st == 400


# ------------------------------------------------------- hypothesis fuzz

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_K = 32
_vals = st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    min_size=0, max_size=600,
)


@settings(max_examples=250, deadline=None)
@given(_vals, st.integers(min_value=0, max_value=600), st.integers(0, 3))
def test_sketch_invariants_fuzz(values, pivot, chunks):
    """Structural invariants under adversarial inputs and arbitrary
    merge trees: exact total weight, byte round-trip identity,
    quantiles monotone and inside the data range, multiset-determined
    bytes regardless of insertion order."""
    sk = QuantileSketch.from_values(values, _K)
    assert sk.total_weight == len(values)
    # byte round-trip is the identity on the wire format
    b = sk.to_bytes()
    assert QuantileSketch.from_bytes(b).to_bytes() == b
    # bytes are a function of the value MULTISET, not insertion order
    assert QuantileSketch.from_values(sorted(values), _K).to_bytes() == b
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = sk.quantiles(qs)
    if not values:
        assert got == [None] * len(qs)
        return
    lo, hi = min(values), max(values)
    assert all(lo <= g <= hi for g in got)
    assert got == sorted(got)
    # split-merge at an arbitrary pivot, then a second split into
    # CHUNKS parts merged left-to-right: weight stays exact
    p = min(pivot, len(values))
    merged = QuantileSketch.from_values(values[:p], _K).merge(
        QuantileSketch.from_values(values[p:], _K))
    assert merged.total_weight == len(values)
    n_parts = chunks + 1
    step = max(1, (len(values) + n_parts - 1) // n_parts)
    parts = [values[i:i + step] for i in range(0, len(values), step)]
    tree = QuantileSketch.merge_all(
        (QuantileSketch.from_values(c, _K) for c in parts), _K)
    assert tree.total_weight == len(values)
    tq = tree.quantiles(qs)
    assert all(lo <= g <= hi for g in tq) and tq == sorted(tq)


@settings(max_examples=250, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32),
                min_size=1, max_size=_K))
def test_sketch_exact_below_capacity(values):
    """n <= k means no compaction ever ran: every quantile is the
    exact rank statistic vals[max(ceil(q*n), 1) - 1]."""
    sk = QuantileSketch.from_values(values, _K)
    v = sorted(values)
    n = len(v)
    for q in (0.0, 0.25, 0.5, 0.75, 0.99, 1.0):
        import math

        want = v[max(math.ceil(q * n), 1) - 1]
        assert sk.quantile(q) == want
