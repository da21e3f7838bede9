"""Experiment-readout semantics pinned on a hand-computed fixture
(first-touch assignment, strictly-after attribution, z arithmetic)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from optiprism_spark.dsl import EventRef, QueryTime
from optiprism_spark.operators.experiment import experiment_report

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
WINDOW = QueryTime.between(dt.datetime(2024, 1, 1),
                           dt.datetime(2024, 1, 31, 23, 59, 59))


@pytest.fixture(scope="module")
def events(spark):
    def e(i, minutes, user, ev, variant=""):
        return (i, T0 + dt.timedelta(minutes=minutes), user, ev,
                0.0, '{"v": "%s"}' % variant)

    rows = [
        # control arm: u1 converts after exposure, u2 does not,
        # u3's purchase PRECEDES exposure (not attributed)
        e(1, 0, 1, "expose", "A"), e(2, 10, 1, "purchase"),
        e(3, 0, 2, "expose", "A"),
        e(4, 0, 3, "purchase"), e(5, 10, 3, "expose", "A"),
        # treatment arm: u4 and u5 convert, u6 does not
        e(6, 0, 4, "expose", "B"), e(7, 5, 4, "purchase"),
        e(8, 0, 5, "expose", "B"), e(9, 1, 5, "purchase"),
        e(10, 0, 6, "expose", "B"),
        # u7: first touch B, later re-exposed as A — stays B
        e(11, 0, 7, "expose", "B"), e(12, 5, 7, "expose", "A"),
        e(13, 9, 7, "purchase"),
        # u8: converts but never exposed — not in any arm
        e(14, 0, 8, "purchase"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _report(events):
    return {
        r["variant"]: r
        for r in experiment_report(
            events,
            variant_col=F.get_json_object("props", "$.v"),
            exposure_event=EventRef("expose"),
            conversion_event=EventRef("purchase"),
            time=WINDOW,
            control="A",
        ).collect()
    }


def test_assignment_and_attribution(events):
    out = _report(events)
    assert set(out) == {"A", "B"}
    a, b = out["A"], out["B"]
    # A: u1 (converted), u2, u3 (purchase before exposure -> not converted)
    assert (a["n_users"], a["n_converted"]) == (3, 1)
    # B: u4, u5, u7 (first-touch B) converted; u6 not
    assert (b["n_users"], b["n_converted"]) == (4, 3)
    assert a["cvr"] == pytest.approx(1 / 3)
    assert b["cvr"] == pytest.approx(3 / 4)


def test_control_row_null_stats(events):
    a = _report(events)["A"]
    assert a["lift"] is None and a["z_score"] is None


def test_z_score_matches_hand_formula(events):
    b = _report(events)["B"]
    n1, x1, n_c, x_c = 4, 3, 3, 1
    cvr, ccvr = x1 / n1, x_c / n_c
    p = (x1 + x_c) / (n1 + n_c)
    se = math.sqrt((p * (1.0 - p)) * (1.0 / n1 + 1.0 / n_c))
    assert b["lift"] == pytest.approx(cvr - ccvr)
    assert b["z_score"] == pytest.approx((cvr - ccvr) / se)


def test_plan_reduces_both_sides_before_join(events, spark):
    from optiprism_spark.schema import load_table

    df = experiment_report(
        load_table(spark, "/root/testdata/sf0.001", "events"),
        variant_col=(F.get_json_object("props", "$.k").cast("long") % 2)
        .cast("string"),
        exposure_event=EventRef("view"),
        conversion_event=EventRef("purchase"),
        time=WINDOW,
        control="0",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # conversions partial-aggregate map-side before their exchange,
    # and the single-row control side joins by broadcast
    assert "partial_max" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_missing_control_raises(events):
    """A control matching no exposures fails loudly instead of
    returning an empty readout (review finding)."""
    with pytest.raises(ValueError, match="matched no exposures"):
        experiment_report(
            events, variant_col=F.get_json_object("props", "$.v"),
            exposure_event=EventRef("expose"),
            conversion_event=EventRef("purchase"),
            time=WINDOW, control="no-such-arm")


def test_srm_check_hand_computed(spark):
    """A deliberately broken 90/10 split under an expected 50/50
    flags; a balanced split does not; equal-split default and
    explicit allocations agree; bad allocations fail loudly."""
    import datetime as dtm

    from optiprism_spark.dsl import QueryTime
    from optiprism_spark.operators.experiment import srm_check

    W = QueryTime.between(dtm.datetime(2024, 1, 1),
                          dtm.datetime(2024, 1, 31))

    def corpus(n_a, n_b):
        rows = []
        for i in range(n_a + n_b):
            v = "A" if i < n_a else "B"
            rows.append((i, dtm.datetime(2024, 1, 5, 10), i, "expose",
                         0.0, '{"v": "%s"}' % v))
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")

    from pyspark.sql import functions as F
    variant = F.get_json_object(F.col("props"), "$.v")
    from optiprism_spark.dsl import EventRef

    # 900/100 under equal expectation: chi2 = (400^2/500)*2 = 640 >> 10.83
    out = srm_check(corpus(900, 100), variant, EventRef("expose"), W)
    rows = {r["variant"]: r for r in out.collect()}
    assert rows["A"]["n_users"] == 900 and rows["B"]["n_users"] == 100
    assert rows["A"]["expected_users"] == 500.0
    assert rows["A"]["chi2_stat"] == pytest.approx(640.0)
    assert all(r["srm_flag"] for r in rows.values())

    # same counts under an explicit 90/10 allocation: no mismatch
    ok = srm_check(corpus(900, 100), variant, EventRef("expose"), W,
                   expected={"A": 0.9, "B": 0.1}).collect()
    assert all(not r["srm_flag"] for r in ok)
    assert {r["variant"]: r["expected_users"] for r in ok} == {
        "A": 900.0, "B": 100.0}

    # balanced split: tiny statistic, no flag
    bal = srm_check(corpus(505, 495), variant, EventRef("expose"), W)
    assert all(not r["srm_flag"] for r in bal.collect())

    with pytest.raises(ValueError):
        srm_check(corpus(10, 10), variant, EventRef("expose"), W,
                  expected={"A": 0.6, "B": 0.6})
    with pytest.raises(ValueError):
        # observed variant absent from the allocation
        srm_check(corpus(10, 10), variant, EventRef("expose"), W,
                  expected={"A": 1.0})


def test_srm_unobserved_expected_variant_flags(spark):
    """An expected-but-UNOBSERVED arm is the most extreme SRM: its
    zero-count cell must enter the chi-square (r14 advice — the old
    observed-only cells silently reported srm_flag=False)."""
    import datetime as dtm

    from pyspark.sql import functions as F

    from optiprism_spark.dsl import EventRef, QueryTime
    from optiprism_spark.operators.experiment import srm_check

    W = QueryTime.between(dtm.datetime(2024, 1, 1),
                          dtm.datetime(2024, 1, 31))
    rows = [(i, dtm.datetime(2024, 1, 5, 10), i, "expose", 0.0,
             '{"v": "A"}') for i in range(100)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    variant = F.get_json_object(F.col("props"), "$.v")

    out = {r["variant"]: r for r in srm_check(
        df, variant, EventRef("expose"), W,
        expected={"A": 0.5, "B": 0.5}).collect()}
    # all 100 users in A under 50/50: chi2 = 50 + 50 = 100 >> 10.83
    assert out["B"]["n_users"] == 0
    assert out["B"]["expected_users"] == 50.0
    assert out["A"]["chi2_stat"] == pytest.approx(100.0)
    assert out["A"]["srm_flag"] and out["B"]["srm_flag"]


def test_srm_df_outside_table_fails_loudly(spark):
    """df outside the 1..9 critical-value table errors instead of
    defaulting srm_flag to False (r14 advice): declared allocations
    validate driver-side, equal-split mode at collect time."""
    import datetime as dtm

    from pyspark.sql import functions as F

    from optiprism_spark.dsl import EventRef, QueryTime
    from optiprism_spark.operators.experiment import srm_check

    W = QueryTime.between(dtm.datetime(2024, 1, 1),
                          dtm.datetime(2024, 1, 31))
    rows = [(i, dtm.datetime(2024, 1, 5, 10), i, "expose", 0.0,
             '{"v": "A"}') for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    variant = F.get_json_object(F.col("props"), "$.v")

    # a single-arm explicit allocation: df=0, rejected up front
    with pytest.raises(ValueError, match=">= 2 expected"):
        srm_check(df, variant, EventRef("expose"), W, expected={"A": 1.0})
    # a declared 0-share arm makes the chi-square undefined (r15
    # advice: the zero-cell guard must not silently absorb it)
    with pytest.raises(ValueError, match="> 0"):
        srm_check(df, variant, EventRef("expose"), W,
                  expected={"A": 1.0, "B": 0.0})
    # equal-split mode with one observed variant: df=0 at runtime
    with pytest.raises(Exception, match="no defined critical value"):
        srm_check(df, variant, EventRef("expose"), W).collect()


def test_srm_wilson_hilferty_wide_allocation(spark):
    """df >= 10 (11+ arms) is served by the Wilson-Hilferty
    approximation instead of erroring (r15 verdict task 8). A 12-arm
    experiment with all traffic in one arm must flag; a near-perfect
    12-way split must not."""
    import datetime as dtm

    from pyspark.sql import functions as F

    from optiprism_spark.dsl import EventRef, QueryTime
    from optiprism_spark.operators.experiment import srm_check

    W = QueryTime.between(dtm.datetime(2024, 1, 1),
                          dtm.datetime(2024, 1, 31))
    arms = [f"V{i:02d}" for i in range(12)]
    expected = {a: 1.0 / 12 for a in arms}

    # all 120 users in V00: the most extreme 12-way mismatch
    rows = [(i, dtm.datetime(2024, 1, 5, 10), i, "expose", 0.0,
             '{"v": "V00"}') for i in range(120)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    variant = F.get_json_object(F.col("props"), "$.v")
    out = srm_check(df, variant, EventRef("expose"), W,
                    expected=expected).collect()
    assert len(out) == 12
    assert all(r["srm_flag"] for r in out)
    # chi2 = (120-10)^2/10 + 11*(0-10)^2/10 = 1210 + 110 = 1320
    assert out[0]["chi2_stat"] == pytest.approx(1320.0)

    # a perfect 12-way split: chi2 = 0, below any critical value
    rows = [(i, dtm.datetime(2024, 1, 5, 10), i, "expose", 0.0,
             f'{{"v": "{arms[i % 12]}"}}') for i in range(120)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = srm_check(df, variant, EventRef("expose"), W,
                    expected=expected).collect()
    assert all(not r["srm_flag"] for r in out)
    # Wilson-Hilferty at df=11 should be near the exact 31.264
    # (alpha=0.001): sanity-pin the approximation itself
    from optiprism_spark.operators.experiment import SRM_Z_001
    k = 11.0
    h = 2.0 / (9.0 * k)
    wh = k * (1.0 - h + SRM_Z_001 * (h ** 0.5)) ** 3
    assert abs(wh - 31.264) / 31.264 < 0.01
