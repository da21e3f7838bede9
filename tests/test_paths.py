"""Path-analysis semantics pinned on a hand-computed fixture (the
oracle suite checks engine≡DuckDB; this checks both against a
human-computed truth, so a shared misunderstanding cannot pass)."""

from __future__ import annotations

import datetime as dt

import pytest

from optiprism_spark.dsl import EventRef, QueryTime
from optiprism_spark.operators.paths import event_paths, path_dropoff

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
WINDOW = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


@pytest.fixture(scope="module")
def events(spark):
    def e(i, minutes, user, ev):
        return (i, T0 + dt.timedelta(minutes=minutes), user, ev, 0.0, "{}")

    rows = [
        # u1: signup, view(+5m), click(+10m), purchase(+200m — beyond
        # any 1h budget from signup)
        e(1, 0, 1, "signup"), e(2, 5, 1, "view"),
        e(3, 10, 1, "click"), e(4, 200, 1, "purchase"),
        # u2: signup, view, click — same shape inside an hour
        e(5, 0, 2, "signup"), e(6, 3, 2, "view"), e(7, 6, 2, "click"),
        # u3: signup, error, view — error is exclude-able noise
        e(8, 0, 3, "signup"), e(9, 1, 3, "error"), e(10, 2, 3, "view"),
        # u4: lone signup (path of length 1)
        e(11, 0, 4, "signup"),
        # u5: two anchors — signup, view, signup, click: the second
        # signup both occupies u5's first path AND starts its own
        e(12, 0, 5, "signup"), e(13, 1, 5, "view"),
        e(14, 2, 5, "signup"), e(15, 3, 5, "click"),
        # tie-break determinism: same-timestamp events ordered by event_id
        e(16, 0, 6, "signup"), e(17, 1, 6, "view"), e(18, 1, 6, "click"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _paths(df):
    return {r["path"]: (r["n_starts"], r["n_users"]) for r in df.collect()}


def test_forward_paths_unbounded(events):
    out = _paths(event_paths(events, EventRef("signup"), WINDOW, steps=3))
    expect = {
        # u1, u2, u6 (ts tie at +1m broken by event_id: view before click)
        "signup -> view -> click": (3, 3),
        # u3 (error not excluded here)
        "signup -> error -> view": (1, 1),
        # u5 first anchor
        "signup -> view -> signup": (1, 1),
        # u5 second anchor
        "signup -> click": (1, 1),
        # u4 lone anchor
        "signup": (1, 1),
    }
    assert out == expect


def test_forward_within_budget_truncates_prefix(events):
    # 1h budget from the anchor: u1's purchase (+200m) falls out, the
    # first three events stay — truncation at a prefix, no holes
    out = _paths(event_paths(
        events, EventRef("signup"), WINDOW, steps=4,
        within=dt.timedelta(hours=1)))
    assert out["signup -> view -> click"] == (3, 3)
    assert not any("purchase" in p for p in out)


def test_exclude_events_removes_from_stream(events):
    out = _paths(event_paths(
        events, EventRef("signup"), WINDOW, steps=3,
        exclude_events=("error",)))
    # u3's error vanishes: signup -> view (stream ends)
    assert out["signup -> view"] == (1, 1)
    assert not any("error" in p for p in out)


def test_backward_paths(events):
    out = _paths(event_paths(
        events, EventRef("click"), WINDOW, steps=3, direction="backward"))
    assert out == {
        # u1, u2, and u6 (u6's ts tie at +1m: lag1 = view by event_id)
        "signup -> view -> click": (3, 3),
        # u5: lag1 = signup(+2m), lag2 = view(+1m), chronological render
        "view -> signup -> click": (1, 1),
    }


def test_topk_cut_deterministic(events):
    out = event_paths(events, EventRef("signup"), WINDOW, steps=3, top_k=2)
    rows = [(r["path"], r["n_starts"]) for r in out.collect()]
    # count desc, then path asc among the 1-count ties
    assert rows == [("signup -> view -> click", 3), ("signup", 1)]


def test_dropoff_matrix(events):
    out = path_dropoff(events, EventRef("signup"), WINDOW, steps=3)
    got = {(r["step"], r["next_event"]): (r["n_starts"], r["n_users"])
           for r in out.collect()}
    assert got == {
        (1, "view"): (4, 4),     # u1, u2, u5 (first anchor), u6
        (1, "error"): (1, 1),    # u3
        (1, "click"): (1, 1),    # u5 second anchor
        (2, "click"): (3, 3),    # u1, u2, u6
        (2, "view"): (1, 1),     # u3
        (2, "signup"): (1, 1),   # u5 first anchor
    }


def test_dropoff_monotone_on_real_data(spark):
    from optiprism_spark.schema import load_table
    out = path_dropoff(
        load_table(spark, "/root/testdata/sf0.001", "events"),
        EventRef("view"), WINDOW, steps=4,
        within=dt.timedelta(hours=1))
    by_step = {}
    for r in out.collect():
        by_step[r["step"]] = by_step.get(r["step"], 0) + r["n_starts"]
    steps = sorted(by_step)
    assert all(by_step[a] >= by_step[b] for a, b in zip(steps, steps[1:]))


def test_custom_anchor_with_property_filters(events, spark):
    """A custom anchor whose members carry property filters works —
    the anchor predicate is evaluated before the narrow projection
    drops the filter's columns (review finding: it crashed with
    UNRESOLVED_COLUMN)."""
    from optiprism_spark.dsl import (
        EventFilterSpec, PropFilter, PropOp, PropertyRef,
    )

    from optiprism_spark.schema import load_table

    # events fixture has props="{}" — use the sf table, whose props
    # carry the JSON int prop k
    real = load_table(spark, "/root/testdata/sf0.001", "events")
    anchor = EventRef(custom=[EventFilterSpec(
        EventRef("signup"),
        filters=(PropFilter(PropertyRef.json("k", "int64"),
                            PropOp.GT, (50,)),),
    )])
    out = event_paths(real, anchor, WINDOW, steps=3, top_k=10).collect()
    assert out and all(r["path"].startswith("signup") for r in out)
    # fewer anchors than the unfiltered variant
    all_out = event_paths(real, EventRef("signup"), WINDOW,
                          steps=3, top_k=1000)
    filt_total = sum(r["n_starts"] for r in out)
    assert filt_total < sum(r["n_starts"] for r in all_out.collect())


def test_max_rows_per_user_noop_and_truncation(spark, events):
    """Whale guard: cap >= every user's rows is a pure no-op; a small
    cap equals running the op on each user's chronologically-first
    cap rows (the guard's documented lossy contract)."""
    want = _paths(event_paths(events, EventRef("signup"), WINDOW, steps=3))
    got = _paths(event_paths(events, EventRef("signup"), WINDOW, steps=3,
                             max_rows_per_user=50))
    assert got == want

    # whale user: signup then 999 views; cap=10 keeps the first 10 rows
    def e(i, minutes, user, ev):
        return (i, T0 + dt.timedelta(minutes=minutes), user, ev, 0.0, "{}")

    whale_rows = [e(1, 0, 9, "signup")] + [
        e(i, i, 9, "view") for i in range(2, 1001)]
    whale = spark.createDataFrame(
        whale_rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    capped = _paths(event_paths(whale, EventRef("signup"), WINDOW, steps=3,
                                max_rows_per_user=10))
    truncated = _paths(event_paths(
        spark.createDataFrame(
            whale_rows[:10],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"),
        EventRef("signup"), WINDOW, steps=3))
    assert capped == truncated == {"signup -> view -> view": (1, 1)}

    # dropoff sees the same guard through its own entry point
    d_capped = {(r["step"], r["next_event"]): r["n_starts"]
                for r in path_dropoff(whale, EventRef("signup"), WINDOW,
                                      steps=3,
                                      max_rows_per_user=10).collect()}
    assert d_capped == {(1, "view"): 1, (2, "view"): 1}
