"""Sustained-ingest compaction: the size/part-count trigger policy
(reference storage/src/table.rs:24-63 l0_max_parts / level sizes) and
the append→compact cycle invariants — snapshot isolation against
concurrent appends, no duplication or loss across cycles, and the
bucketed funnel plan staying Exchange-free after every fold."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from optiprism_spark.api import (
    EventFilterSpec,
    EventRef,
    FunnelRequest,
    FunnelStep,
    QueryTime,
    TimeIntervalUnit,
)
from optiprism_spark.ingest import (
    CompactionPolicy,
    _append_part_files,
    compact_appends_into_bucketed,
    write_events_bucketed,
)
from optiprism_spark.operators.funnel import funnel_attempts
from optiprism_spark.schema import load_table
from optiprism_spark.streaming.sessionize import append_events

from .conftest import drop_table_clean

SF_DIR = "/root/testdata/sf0.001"
TBL = "events_policy_test"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def base_events(spark):
    # unpersist on teardown: a leftover cache entry would substitute
    # the full-schema InMemoryRelation into later tests' plans,
    # breaking the column-pruning assertions in test_plans.py
    df = load_table(spark, SF_DIR, "events").cache()
    yield df
    df.unpersist()


def _fresh(events, n, id_offset):
    return (
        events.orderBy("event_id").limit(n)
        .withColumn("event_id", F.col("event_id") + F.lit(id_offset))
    )


def test_policy_triggers_on_parts_or_bytes(spark, base_events, tmp_path):
    appends = str(tmp_path / "appends")
    pol = CompactionPolicy(l0_max_parts=3, l0_max_bytes=10**12)
    drop_table_clean(spark, TBL)
    try:
        write_events_bucketed(base_events, TBL, n_buckets=4)
        # below threshold: no compaction runs
        append_events(_fresh(base_events, 10, 10_000_000), appends)
        assert not pol.should_compact(appends)
        assert pol.maybe_compact(spark, TBL, appends, n_buckets=4) == 0
        parts0, _ = pol.l0_stats(appends)
        assert parts0 >= 1
        # accumulate past l0_max_parts: trigger fires, folds ALL
        # accumulated rows, and resets L0 to empty
        append_events(_fresh(base_events, 10, 20_000_000), appends)
        append_events(_fresh(base_events, 10, 30_000_000), appends)
        assert pol.should_compact(appends)
        assert pol.maybe_compact(spark, TBL, appends, n_buckets=4) == 30
        assert pol.l0_stats(appends) == (0, 0)
        assert spark.table(TBL).count() == base_events.count() + 30
        # byte trigger, independently of part count
        tiny = CompactionPolicy(l0_max_parts=10**6, l0_max_bytes=1)
        append_events(_fresh(base_events, 5, 40_000_000), appends)
        assert tiny.should_compact(appends)
        assert tiny.maybe_compact(spark, TBL, appends, n_buckets=4) == 5
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {TBL}")
        spark.sql(f"DROP TABLE IF EXISTS {TBL}__compact_staging")


def test_snapshot_isolation_under_concurrent_appends(
        spark, base_events, tmp_path):
    """A file landing after the compactor lists its snapshot is
    neither folded nor deleted — it survives to the next cycle."""
    appends = str(tmp_path / "appends")
    drop_table_clean(spark, TBL)
    try:
        write_events_bucketed(base_events, TBL, n_buckets=4)
        append_events(_fresh(base_events, 20, 10_000_000), appends)
        snapshot = _append_part_files(appends)
        # simulate traffic racing the rewrite: land a new batch now
        append_events(_fresh(base_events, 7, 20_000_000), appends)
        # compact ONLY the snapshot (what a racing compactor sees)
        from optiprism_spark import ingest as ingest_mod
        real = ingest_mod._append_part_files
        ingest_mod._append_part_files = lambda p: snapshot
        try:
            n = compact_appends_into_bucketed(spark, TBL, appends, n_buckets=4)
        finally:
            ingest_mod._append_part_files = real
        assert n == 20
        # the racing batch is still in L0, untouched
        left = spark.read.parquet(appends)
        assert left.count() == 7
        # next cycle folds it — nothing lost, nothing doubled
        n2 = compact_appends_into_bucketed(spark, TBL, appends, n_buckets=4)
        assert n2 == 7
        assert spark.table(TBL).count() == base_events.count() + 27
        ids = spark.table(TBL).groupBy("event_id").count() \
            .filter(F.col("count") > 1).count()
        assert ids == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {TBL}")
        spark.sql(f"DROP TABLE IF EXISTS {TBL}__compact_staging")


def test_repeated_cycles_keep_funnel_invariants(spark, base_events, tmp_path):
    """N append→compact cycles: after every fold the bucketed funnel
    plan is still Exchange-free and matches the unbucketed path."""
    appends = str(tmp_path / "appends")
    pol = CompactionPolicy(l0_max_parts=1)
    req = FunnelRequest(
        time=QueryTime.between(
            dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59)),
        interval=TimeIntervalUnit.DAY,
        steps=[
            FunnelStep([EventFilterSpec(EventRef("view"))]),
            FunnelStep([EventFilterSpec(EventRef("purchase"))]),
        ],
        window_ms=7 * 86_400_000,
    )

    def key(r):
        return (r.user_id, r.steps_completed, r.is_completed, r.attempt_ts)

    drop_table_clean(spark, TBL)
    try:
        write_events_bucketed(base_events, TBL, n_buckets=4)
        all_events = base_events
        for cycle in range(3):
            fresh = _fresh(base_events, 15, (cycle + 1) * 10_000_000)
            append_events(fresh, appends)
            assert pol.maybe_compact(spark, TBL, appends, n_buckets=4) == 15
            all_events = all_events.unionByName(fresh)
            bucketed = spark.table(TBL)
            assert bucketed.count() == all_events.count()
            fast = funnel_attempts(bucketed, req, assume_partitioned=True)
            assert "Exchange" not in _plan(fast), f"cycle {cycle}"
            slow = funnel_attempts(all_events, req)
            assert sorted(map(key, fast.collect())) == \
                sorted(map(key, slow.collect())), f"cycle {cycle}"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {TBL}")
        spark.sql(f"DROP TABLE IF EXISTS {TBL}__compact_staging")
