"""Synthetic event generator tests (reference events-gen crate parity:
deterministic Markov session walks, typed events, product draws)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from optiprism_spark.events_gen import TRANSITIONS, generate_events


def test_deterministic_and_schema(spark):
    a = generate_events(spark, 30, sessions_per_user=2).collect()
    b = generate_events(spark, 30, sessions_per_user=2).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    assert [f.name for f in generate_events(spark, 1).schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props"]
    # different seed -> different corpus
    c = generate_events(spark, 30, sessions_per_user=2, seed="other").collect()
    assert sorted(map(str, a)) != sorted(map(str, c))


def test_walk_semantics(spark):
    df = generate_events(spark, 80, sessions_per_user=2)
    rows = df.collect()
    assert rows, "generator produced no events"
    # chain invariants: purchases only happen after a checkout in the
    # same session; refunds only after a purchase; purchase value is
    # the deterministic product price
    by_sess = {}
    for r in rows:
        sess = json.loads(r.props)["session"]
        by_sess.setdefault((r.user_id, sess), []).append(r)
    n_purchases = 0
    for sess_rows in by_sess.values():
        sess_rows.sort(key=lambda r: r.event_id)
        seen = set()
        for r in sess_rows:
            if r.event_type == "purchase":
                assert "checkout" in seen, sess_rows
                assert r.value and r.value > 0
                n_purchases += 1
            if r.event_type == "refund":
                assert "purchase" in seen
                assert r.value < 0
            seen.add(r.event_type)
        # timestamps non-decreasing within the session walk
        ts = [r.ts for r in sess_rows]
        assert ts == sorted(ts)
    assert n_purchases > 0, "chain never converts at these weights"
    # event ids unique across the corpus
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))


def test_generated_corpus_drives_the_engine(spark):
    """The generated frame drops into the real operators: a funnel
    over product->add_to_cart->purchase counts conversions."""
    import datetime as dt

    from optiprism_spark.dsl import (
        EventFilterSpec, EventRef, FunnelRequest, FunnelStep, QueryTime,
        TimeIntervalUnit,
    )
    from optiprism_spark.operators.funnel import funnel_attempts

    events = generate_events(spark, 150, sessions_per_user=2)
    req = FunnelRequest(
        time=QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 3, 1)),
        interval=TimeIntervalUnit.DAY,
        steps=[FunnelStep([EventFilterSpec(EventRef("product"))]),
               FunnelStep([EventFilterSpec(EventRef("add_to_cart"))]),
               FunnelStep([EventFilterSpec(EventRef("purchase"))])],
        window_ms=3600_000,
    )
    out = funnel_attempts(events, req).collect()
    assert any(r.is_completed for r in out)
    # weights say ~35% cart, ~49% cart->purchase: conversion must be
    # plausible, not degenerate
    conv = sum(r.is_completed for r in out) / len(out)
    assert 0.01 < conv < 0.9, conv


def test_transition_weights_are_stochastic_rows():
    for action, edges in TRANSITIONS.items():
        total = sum(w for _, w, _ in edges)
        assert abs(total - 1.0) < 1e-9, (action, total)
        for nxt, _, dwell in edges:
            assert nxt in TRANSITIONS or nxt == "end", (action, nxt)
            assert dwell >= 0


def test_skewed_generator_zipf_whale_and_guard(spark):
    """generate_events_skewed: zipf head/tail shape, whale override,
    unique event_ids across the skew, and the funnel whale guard
    truncating the whale (whale_acc proves the executor-side warn
    path fired — the skew harness relies on this hook)."""
    import datetime as dt

    from optiprism_spark.dsl import (
        EventFilterSpec, EventRef, FunnelRequest, FunnelStep, QueryTime,
        TimeIntervalUnit,
    )
    from optiprism_spark.events_gen import generate_events_skewed
    from optiprism_spark.operators.funnel import funnel_attempts

    events = generate_events_skewed(
        spark, 150, whales={0: 300}, head_sessions=16).cache()
    try:
        per_user = {r.user_id: r.n for r in
                    events.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
        # whale dominates; zipf head > tail; ids collision-free
        tail_max = max(n for u, n in per_user.items() if u >= 100)
        assert per_user[0] > 10 * tail_max
        assert per_user[1] > tail_max
        assert events.count() == events.select("event_id").distinct().count()
        # determinism
        assert (generate_events_skewed(spark, 150, whales={0: 300},
                                       head_sessions=16).count() == events.count())

        req = FunnelRequest(
            time=QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2026, 1, 1)),
            interval=TimeIntervalUnit.DAY,
            steps=[FunnelStep([EventFilterSpec(EventRef("product"))]),
                   FunnelStep([EventFilterSpec(EventRef("add_to_cart"))]),
                   FunnelStep([EventFilterSpec(EventRef("purchase"))])],
            window_ms=3600_000,
        )
        acc = spark.sparkContext.accumulator(0)
        cap = 50
        out = funnel_attempts(events, req, max_rows_per_user=cap,
                              whale_acc=acc).collect()
        assert acc.value >= per_user[0] - cap - 65536  # fired, Arrow-batch slack
        assert acc.value > 0
        # guarded run still produces attempts for non-whale users
        assert any(r.user_id != 0 for r in out)
    finally:
        events.unpersist()
