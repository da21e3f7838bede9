"""Funnel state-machine tests — scripted event sequences with expected
per-attempt traces, porting the reference's scenario axes
(funnel.rs:964-2128 test_cases / test_1min_buckets / test_groups,
FIXTURES.md §4): 3-steps-pass, unique-count second-conversion skip,
out-of-window reset, exclude between steps, constant violation,
any-order, multiple users, breakdowns, bucket attribution.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from optiprism_spark.dsl import (
    EventFilterSpec,
    EventRef,
    FunnelCountMode,
    FunnelExclude,
    FunnelFilter,
    FunnelRequest,
    FunnelStep,
    PropertyRef,
    QueryTime,
    StepOrder,
    TimeIntervalUnit,
)
from optiprism_spark.operators.funnel import funnel_attempts, funnel_report

T0 = dt.datetime(2024, 1, 1, 11, 0, 0)
_TIME = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))


def mk_events(spark, rows):
    """rows: (user, minutes_after_T0, event, const_val)"""
    data = [
        (i, T0 + dt.timedelta(minutes=m), int(u), e, float(c), "{}")
        for i, (u, m, e, c) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def steps(*names):
    return [FunnelStep([EventFilterSpec(EventRef(n))]) for n in names]


def req3(window_min=15, **kw):
    defaults = dict(
        time=_TIME,
        interval=TimeIntervalUnit.DAY,
        steps=steps("e1", "e2", "e3"),
        window_ms=window_min * 60 * 1000,
    )
    defaults.update(kw)
    return FunnelRequest(**defaults)


def attempts_of(spark, rows, req):
    df = funnel_attempts(mk_events(spark, rows), req)
    return sorted(
        df.select("user_id", "steps_completed", "is_completed").collect(),
        key=lambda r: (r.user_id, -r.steps_completed),
    )


def test_three_steps_pass(spark):
    rows = [(1, 0, "e1", 1), (1, 2, "e2", 1), (1, 3, "e3", 1)]
    out = attempts_of(spark, rows, req3())
    assert [(r.steps_completed, r.is_completed) for r in out] == [(3, True)]


def test_unique_mode_skips_second_conversion(spark):
    rows = [
        (1, 0, "e1", 1), (1, 1, "e2", 1), (1, 2, "e3", 1),
        (1, 3, "e1", 1), (1, 4, "e2", 1), (1, 5, "e3", 1),
    ]
    out = attempts_of(spark, rows, req3(count_mode=FunnelCountMode.UNIQUE))
    assert [(r.steps_completed, r.is_completed) for r in out] == [(3, True)]
    out2 = attempts_of(spark, rows, req3(count_mode=FunnelCountMode.NON_UNIQUE))
    assert [(r.steps_completed, r.is_completed) for r in out2] == [(3, True), (3, True)]


def test_out_of_window_flush_and_restart(spark):
    # e2 arrives 16 min after e1 (window 15): first attempt flushes with
    # 1 completed step; the greedy machine does NOT retry from the
    # orphaned e2 (reference funnel.rs:558-566 restart-from-current-row)
    rows = [(1, 0, "e1", 1), (1, 16, "e2", 1), (1, 17, "e3", 1)]
    out = attempts_of(spark, rows, req3())
    assert [(r.steps_completed, r.is_completed) for r in out] == [(1, False)]
    # but a fresh e1 within window converts
    rows2 = rows + [(1, 20, "e1", 1), (1, 21, "e2", 1), (1, 22, "e3", 1)]
    out2 = attempts_of(spark, rows2, req3())
    assert [(r.steps_completed, r.is_completed) for r in out2] == [(3, True), (1, False)]


def test_exclude_resets_without_counting(spark):
    # exclude event between steps: attempt vanishes (reference resets
    # WITHOUT push_result, funnel.rs:544-556), then the reprocessed
    # stream converts from the later e1
    rows = [
        (1, 0, "e1", 1), (1, 1, "bad", 1), (1, 2, "e2", 1),
        (1, 3, "e1", 1), (1, 4, "e2", 1), (1, 5, "e3", 1),
    ]
    req = req3(excludes=[FunnelExclude(EventFilterSpec(EventRef("bad")))])
    out = attempts_of(spark, rows, req)
    assert [(r.steps_completed, r.is_completed) for r in out] == [(3, True)]


def test_exclude_with_step_range(spark):
    # exclude only while seeking step 2 (range (2,2)): a `bad` between
    # e1 and e2 is harmless, between e2 and e3 it resets
    req = req3(excludes=[FunnelExclude(EventFilterSpec(EventRef("bad")), between_steps=(2, 2))])
    ok = [(1, 0, "e1", 1), (1, 1, "bad", 1), (1, 2, "e2", 1), (1, 3, "e3", 1)]
    out = attempts_of(spark, ok, req)
    assert [(r.steps_completed, r.is_completed) for r in out] == [(3, True)]
    # `bad` while seeking step 2 resets WITHOUT recording the attempt
    # (reference: exclude violation never calls push_result) and e1 is
    # not revisited → nothing at all is emitted
    reset = [(1, 0, "e1", 1), (1, 1, "e2", 1), (1, 2, "bad", 1), (1, 3, "e3", 1)]
    out2 = attempts_of(spark, reset, req)
    assert out2 == []


def test_constant_violation(spark):
    # holding constant: value must match across the attempt's steps
    req = req3(constants=[PropertyRef.column("value")])
    # violation at e2@8 erases the attempt (no push_result); a fresh
    # e1@7 afterwards converts with constants held at 7
    rows = [(1, 0, "e1", 7), (1, 1, "e2", 8), (1, 2, "e1", 7), (1, 3, "e2", 7), (1, 4, "e3", 7)]
    out = attempts_of(spark, rows, req)
    assert [(r.steps_completed, r.is_completed) for r in out] == [(3, True)]
    # violation with no later e1 → nothing emitted at all
    rows2 = [(1, 0, "e1", 7), (1, 1, "e2", 8), (1, 2, "e3", 8)]
    out2 = attempts_of(spark, rows2, req)
    assert out2 == []


def test_any_order_steps(spark):
    # steps 1 and 2 may arrive in any order within ranges (1,2)
    any_steps = [
        FunnelStep([EventFilterSpec(EventRef("e1"))]),
        FunnelStep([EventFilterSpec(EventRef("e2")), EventFilterSpec(EventRef("e3"))],
                   order=StepOrder.ANY, any_ranges=[(1, 2)]),
        FunnelStep([EventFilterSpec(EventRef("e2")), EventFilterSpec(EventRef("e3"))],
                   order=StepOrder.ANY, any_ranges=[(1, 2)]),
    ]
    rows = [(1, 0, "e1", 1), (1, 1, "e3", 1), (1, 2, "e2", 1)]
    out = attempts_of(spark, rows, req3(steps=any_steps))
    assert [(r.steps_completed, r.is_completed) for r in out] == [(3, True)]


def test_repeated_event_steps(spark):
    # all three steps match the SAME event: three e1 rows convert
    # (each row satisfies exactly one machine step in sequence)
    rows = [(1, 0, "e1", 1), (1, 1, "e1", 1), (1, 2, "e1", 1)]
    out = attempts_of(spark, rows, req3(steps=steps("e1", "e1", "e1")))
    assert [(r.steps_completed, r.is_completed) for r in out] == [(3, True)]


def test_exclude_event_equals_step_event(spark):
    # exclude e1 while steps are e1→e2: a second e1 mid-attempt resets
    # and the reprocessed row seeds a NEW attempt, which then converts
    rows = [(1, 0, "e1", 1), (1, 1, "e1", 1), (1, 2, "e2", 1)]
    req = req3(
        steps=steps("e1", "e2"),
        excludes=[FunnelExclude(EventFilterSpec(EventRef("e1")))],
    )
    out = attempts_of(spark, rows, req)
    assert [(r.steps_completed, r.is_completed) for r in out] == [(2, True)]


def test_multiple_users_and_dropoff(spark):
    rows = [
        (1, 0, "e1", 1), (1, 1, "e2", 1), (1, 2, "e3", 1),
        (2, 0, "e1", 1), (2, 1, "e2", 1),
        (3, 5, "e1", 1),
    ]
    out = attempts_of(spark, rows, req3())
    assert [(r.user_id, r.steps_completed, r.is_completed) for r in out] == [
        (1, 3, True), (2, 2, False), (3, 1, False),
    ]


def test_report_metrics(spark):
    rows = [
        (1, 0, "e1", 1), (1, 1, "e2", 1), (1, 3, "e3", 1),   # converts 1m, 3m
        (2, 0, "e1", 1), (2, 2, "e2", 1),                     # drops at step 2
        (3, 5, "e1", 1),                                      # drops at step 1
    ]
    rep = funnel_report(mk_events(spark, rows), req3()).collect()
    assert len(rep) == 1
    r = rep[0]
    assert (r.total, r.completed) == (3, 1)
    assert (r.step0_total, r.step1_total, r.step2_total) == (3, 2, 1)
    assert r.step1_dropped_off == 1 and r.step2_dropped_off == 1
    assert r.step0_conversion_ratio == 100.0
    assert r.step2_conversion_ratio == pytest.approx(100.0 / 3)
    # avg time-to-convert in ms: step1 = mean(60s, 120s)=90s
    assert r.step1_avg_time_to_convert == pytest.approx(90_000.0)
    assert r.step2_avg_time_to_convert == pytest.approx(120_000.0)
    assert r.bucket == dt.date(2024, 1, 1)


def test_time_to_convert_filter(spark):
    rows = [
        (1, 0, "e1", 1), (1, 1, "e2", 1), (1, 2, "e3", 1),    # 2 min
        (2, 0, "e1", 1), (2, 5, "e2", 1), (2, 12, "e3", 1),   # 12 min
    ]
    req = req3(filter=FunnelFilter("time_to_convert", min_ms=0, max_ms=5 * 60 * 1000))
    out = attempts_of(spark, rows, req)
    by_user = {r.user_id: r.is_completed for r in out}
    assert by_user == {1: True, 2: False}


def test_breakdowns(spark):
    # per-breakdown state machines: the same user converts for device A
    # but not when rows interleave with device B
    data = [
        (0, T0, 1, "e1", 1.0, '{"d": "A"}'),
        (1, T0 + dt.timedelta(minutes=1), 1, "e2", 1.0, '{"d": "A"}'),
        (2, T0 + dt.timedelta(minutes=2), 1, "e3", 1.0, '{"d": "A"}'),
        (3, T0 + dt.timedelta(minutes=3), 1, "e1", 1.0, '{"d": "B"}'),
        (4, T0 + dt.timedelta(minutes=4), 1, "e2", 1.0, '{"d": "B"}'),
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    req = req3(breakdowns=[PropertyRef.json("d")], count_mode=FunnelCountMode.NON_UNIQUE)
    out = funnel_attempts(df, req).select("d", "steps_completed", "is_completed").collect()
    by_bd = {(r.d, r.steps_completed, r.is_completed) for r in out}
    assert by_bd == {("A", 3, True), ("B", 2, False)}


def test_breakdown_null_values_form_their_own_group(spark):
    # rows whose breakdown property is absent (null) must run in ONE
    # machine of their own, distinct from every non-null value — the
    # vectorized boundary detection treats consecutive NaNs as
    # no-change (old pandas groupby(dropna=False) semantics)
    data = [
        (0, T0, 1, "e1", 1.0, '{"d": "A"}'),
        (1, T0 + dt.timedelta(minutes=1), 1, "e1", 1.0, '{}'),
        (2, T0 + dt.timedelta(minutes=2), 1, "e2", 1.0, '{}'),
        (3, T0 + dt.timedelta(minutes=3), 1, "e2", 1.0, '{"d": "A"}'),
        (4, T0 + dt.timedelta(minutes=4), 1, "e3", 1.0, '{}'),
        (5, T0 + dt.timedelta(minutes=5), 1, "e3", 1.0, '{"d": "A"}'),
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    req = req3(breakdowns=[PropertyRef.json("d")], count_mode=FunnelCountMode.NON_UNIQUE)
    out = funnel_attempts(df, req).select("d", "steps_completed", "is_completed").collect()
    by_bd = {(r.d, r.steps_completed, r.is_completed) for r in out}
    assert by_bd == {("A", 3, True), (None, 3, True)}


def test_bucket_attribution_by_first_step(spark):
    # attempt starting 23:58 Jan-1 completing 00:02 Jan-2 lands in the
    # Jan-1 bucket (attribution by step-0 ts, reference funnel.rs:208-214)
    rows = [(1, 23 * 60 + 58 - 11 * 60, "e1", 1), (1, 23 * 60 + 59 - 11 * 60, "e2", 1),
            (1, 24 * 60 + 2 - 11 * 60, "e3", 1)]
    rep = funnel_report(mk_events(spark, rows), req3()).collect()
    assert len(rep) == 1 and rep[0].bucket == dt.date(2024, 1, 1)


# ------------------------------------------ streaming-kernel guarantees

def _grid_rows(n_users=10, rows_per_user=60):
    """Deterministic multi-user stream: event cycles through
    e1/e2/e3/noise offset by user, 3-minute spacing (window expiries
    and restarts included)."""
    rows = []
    for u in range(1, n_users + 1):
        for i in range(rows_per_user):
            ev = ["e1", "e2", "e3", "noise"][(i + u) % 4]
            rows.append((u, i * 3, ev, (i // 20) + 1))
    return rows


def _collect_attempts(df):
    return sorted(
        tuple(r) for r in
        df.select("user_id", "steps_completed", "is_completed",
                  "attempt_ts", "ts_0", "ts_1", "ts_2").collect()
    )


@pytest.mark.parametrize("extra", [
    {},  # relevance-filtered path
    {"constants": [PropertyRef.column("value")]},  # full-stream path
    {"count_mode": FunnelCountMode.SESSION},       # sessionized path
    # breakdown path: per-(user, value) machines — exercises the pandas
    # positional-index grouping across batch-sliced frames
    {"breakdowns": [PropertyRef.column("value")],
     "count_mode": FunnelCountMode.NON_UNIQUE},
])
def test_tiny_arrow_batches_match_default(spark, extra):
    """The streamed kernel (per-Arrow-batch + boundary-user carry)
    must be byte-identical to whole-partition processing. Forcing
    64-row batches makes every user straddle batch edges; running on
    one pre-sorted partition (assume_partitioned over repartition(1))
    makes batches contain many users AND split users mid-batch."""
    events = mk_events(spark, _grid_rows())
    req = req3(**extra)
    want = _collect_attempts(funnel_attempts(events, req))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        got_shuffled = _collect_attempts(funnel_attempts(events, req))
        got_single = _collect_attempts(
            funnel_attempts(events.repartition(1), req, assume_partitioned=True)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got_shuffled == want
    assert got_single == want


def test_whale_user_cap_truncates_and_isolates(spark):
    """max_rows_per_user: a pathological user is truncated to their
    first N rows (deterministic — time order) without touching other
    users, even when the whale spans many tiny Arrow batches."""
    whale = [(1, m, ["e1", "e2", "e3"][m % 3], 1) for m in range(2000)]
    normal = [(2, 0, "e1", 1), (2, 1, "e2", 1), (2, 2, "e3", 1)]
    events = mk_events(spark, whale + normal)
    capped_input = mk_events(spark, whale[:300] + normal)
    req = req3(count_mode=FunnelCountMode.NON_UNIQUE)

    want = _collect_attempts(funnel_attempts(capped_input, req))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        got = _collect_attempts(
            funnel_attempts(events, req, max_rows_per_user=300))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want
    # the normal user's conversion is intact
    assert any(r[0] == 2 and r[2] for r in got)


# --------------------------------------------- round-6 review fixes

def test_match_all_step_and_exclude(spark):
    """EventRef() with no name means match-ALL (reference: no event
    predicate => every row matches): 'did anything -> e2' must build
    and count, and a step mixing match-all with a named event must be
    TRUE everywhere, not silently narrowed to the named event."""
    rows = [(1, 0, "x", 0), (1, 1, "e2", 0), (2, 0, "e2", 0)]
    req = req3(steps=[
        FunnelStep([EventFilterSpec(EventRef())]),
        FunnelStep([EventFilterSpec(EventRef("e2"))]),
    ])
    got = attempts_of(spark, rows, req)
    # user 1: x (all) -> e2 completes; user 2: e2 matches step 0 (all)
    # then no second e2 row -> drop-off at step 1
    assert [(r.user_id, r.steps_completed) for r in got] == [(1, 2), (2, 1)]

    mixed = req3(steps=[
        FunnelStep([EventFilterSpec(EventRef()),
                    EventFilterSpec(EventRef("e9"))]),
        FunnelStep([EventFilterSpec(EventRef("e2"))]),
    ])
    got2 = attempts_of(spark, rows, mixed)
    assert [(r.user_id, r.steps_completed) for r in got2] == [(1, 2), (2, 1)]


def test_any_order_empty_ranges_rejected(spark):
    req = req3(steps=[
        FunnelStep([EventFilterSpec(EventRef("e1"))], order=StepOrder.ANY),
        FunnelStep([EventFilterSpec(EventRef("e2"))]),
    ])
    with pytest.raises(ValueError, match="any_ranges"):
        funnel_attempts(mk_events(spark, [(1, 0, "e1", 0)]), req).collect()


def test_null_user_rows_are_dropped_not_crash(spark):
    df = mk_events(spark, [(1, 0, "e1", 0), (1, 1, "e2", 0), (1, 2, "e3", 0)])
    nulled = df.unionByName(
        df.limit(1).select(
            (F.col("event_id") + 100).alias("event_id"), "ts",
            F.lit(None).cast("long").alias("user_id"),
            "event_type", "value", "props")
    )
    got = funnel_attempts(nulled, req3()).collect()
    assert [(r.user_id, r.steps_completed) for r in got] == [(1, 3)]


def test_constant_violation_after_window_expiry_flushes_first(spark):
    """Reference loop order (funnel.rs:545-591): window expiry flushes
    BEFORE the constants check, so a deviating-constant row arriving
    after expiry cannot erase the expired attempt."""
    rows = [(1, 0, "e1", 1), (1, 16, "e1", 2)]  # window 15 min
    req = req3(constants=[PropertyRef.column("value")])
    got = attempts_of(spark, rows, req)
    # old (wrong) order reset the first attempt without flushing -> 1
    # attempt; reference order flushes it -> both attempts reported
    assert [r.steps_completed for r in got] == [1, 1]


def test_session_mode_with_breakdown_uses_full_stream_gaps(spark):
    """A user alternating breakdown values every 20 min has NO real
    30-min session gap; per-(user, bd) gap detection would fabricate
    one and split the attempt. Sessions must come from the user's
    full stream."""
    rows = [(1, 0, "e1", 7), (1, 20, "x", 8), (1, 40, "e2", 7),
            (1, 60, "x", 8), (1, 80, "e3", 7)]
    req = req3(window_min=120,
               count_mode=FunnelCountMode.SESSION,
               breakdowns=[PropertyRef.column("value")])
    got = funnel_attempts(mk_events(spark, rows), req) \
        .filter(F.col("steps_completed") == 3).collect()
    # bd=7.0 rows e1(t0) e2(t40) e3(t80): one true session (gaps 20m)
    assert len(got) == 1 and got[0]["value"] == 7.0


def test_backstop_cap_with_breakdowns_truncates_in_time_order(spark):
    """Duplicate (ts, eid) pairs defeat the pre-shuffle prune's
    row_number cutoff, forcing the kernel backstop; with breakdowns it
    must keep the cap time-earliest rows, not the first breakdown
    group of the (user, bd, ts) sort."""
    data = [
        # one genuinely-earliest row in the LATE-sorting breakdown
        # (9.0), then a 4-way (ts, eid) tie at the prune cutoff: the
        # row_number cutoff keeps all 5 rows, forcing the kernel
        # backstop with cap=2.
        (0, T0 + dt.timedelta(minutes=0), 1, "e1", 9.0, "{}"),
        (7, T0 + dt.timedelta(minutes=5), 1, "e1", 1.0, "{}"),
        (7, T0 + dt.timedelta(minutes=5), 1, "e1", 1.0, "{}"),
        (7, T0 + dt.timedelta(minutes=5), 1, "e1", 9.0, "{}"),
        (7, T0 + dt.timedelta(minutes=5), 1, "e1", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    req = req3(steps=steps("e1"),
               breakdowns=[PropertyRef.column("value")])
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        got = funnel_attempts(df, req, max_rows_per_user=2).collect()
    # the kept 2 rows must include the time-earliest row (bd=9.0 at
    # t+0); a positional cut under the (user, bd, ts) sort keeps two
    # bd=1.0 rows (they sort first) and drops the earliest row
    assert len(got) == 2 and 9.0 in {r["value"] for r in got}
