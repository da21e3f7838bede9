"""Warehouse co-bucketed layout: routing, staleness, live ingest.

r12 replaces the rename-swap fold with a single-pointer commit:
every fold writes NEW generation-numbered tables and flips ONE
atomically-replaced pointer file, so (a) readers always resolve a
consistent (orders, lineitem) pair — no cross-table swap window,
(b) crash recovery needs no catalog-state machine (the r11 one was
unsound across process restarts, ADVICE r11 high), and (c) folded
builds survive source-file noise — only the explicit
``invalidate_layout`` discards them (ADVICE r11 medium).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from optiprism_spark import warehouse_layout as wl
from optiprism_spark.registry import QUERIES
from optiprism_spark.schema import load_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fact_copy(tmp_path) -> str:
    """A private sf_dir with just the tables the warehouse queries
    touch — isolates layout state from the shared SF_SMOKE session
    (other tests may have built SF_SMOKE's layout already)."""
    from optiprism_spark.schema import TABLES

    d = str(tmp_path / "sf")
    os.makedirs(d)
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        dst = os.path.join(d, f"{t}.parquet")
        (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)
    return d


def test_order_facts_falls_back_to_raw(spark, tmp_path):
    """No layout built → routed loader serves plain parquet and counts
    the raw decision; the default query still answers correctly."""
    from optiprism_spark import metrics

    sf = _fact_copy(tmp_path)
    assert not wl.layout_available(spark, sf)
    o, l = wl.order_facts(spark, sf)
    # raw parquet scan, not a bucketed catalog table
    assert "parquet" in _plan(o.groupBy().count()).lower()
    assert o.count() == load_table(spark, sf, "orders").count()
    assert ('optiprism_warehouse_layout_routed_total{path="raw"}'
            in metrics.REGISTRY.render())


def test_default_query_routes_through_layout(spark, tmp_path):
    """THE r10 verdict's top task: once the layout exists,
    wh_revenue_by_nation (the default name, not the _bucketed twin)
    plans the fact⋈fact join Exchange-free — exactly one
    hashpartitioning exchange remains (the 25-row final aggregate) —
    and the answer matches the raw path bit-for-bit."""
    from optiprism_spark import metrics

    sf = _fact_copy(tmp_path)
    raw = sorted(map(tuple, QUERIES["wh_revenue_by_nation"](
        spark, sf).collect()))
    wl.cobucketed_order_facts(spark, sf)  # build → routing flips
    assert wl.layout_available(spark, sf)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["wh_revenue_by_nation"](spark, sf)
        plan = _plan(df)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SortMergeJoin" in plan, plan
        assert sorted(map(tuple, df.collect())) == raw
        # the EXISTS pipeline routes too
        pplan = _plan(QUERIES["wh_order_priority_pipeline"](spark, sf))
        assert pplan.count("Exchange hashpartitioning") == 1, pplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert ('optiprism_warehouse_layout_routed_total{path="layout"}'
            in metrics.REGISTRY.render())


def test_sql_api_views_route_through_layout(spark, tmp_path):
    """register_views serves the fact pair from the layout when it
    exists: an ad-hoc SQL join on the order key goes Exchange-free."""
    from optiprism_spark.schema import register_views

    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    register_views(spark, sf)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark.sql(
            "SELECT o_orderkey, count(*) AS n FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"))
        assert "SortMergeJoin" in plan, plan
        # join itself contributes no exchange; the groupBy rides the
        # join's (bucketed) partitioning on the same key → zero total
        assert plan.count("Exchange hashpartitioning") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_regenerated_source_invalidates_layout(spark, tmp_path):
    """ADVICE r10: the layout tag carries a source fingerprint —
    rewriting the source parquet at the SAME sf_dir changes the tag,
    so layout_available flips false and the routed loader reflects
    the NEW data instead of serving the stale bucketed copy."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    assert wl.layout_available(spark, sf)
    old_o, _ = wl.current_table_names(spark, sf)
    # regenerate orders at the same path with one order dropped
    orders = load_table(spark, sf, "orders")
    n0 = orders.count()
    first_key = orders.select(F.min("o_orderkey")).first()[0]
    trimmed = orders.filter(F.col("o_orderkey") != first_key).toPandas()
    shutil.rmtree(os.path.join(sf, "orders.parquet"), ignore_errors=True)
    try:
        os.remove(os.path.join(sf, "orders.parquet"))
    except FileNotFoundError:
        pass
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(trimmed),
                   os.path.join(sf, "orders.parquet"))
    assert not wl.layout_available(spark, sf)
    o, _ = wl.order_facts(spark, sf)  # raw fallback sees the new data
    assert o.count() == n0 - 1
    # rebuilding for the regenerated source garbage-collects the
    # superseded generation (the pointer no longer names it)
    wl.cobucketed_order_facts(spark, sf)
    assert wl.layout_available(spark, sf)
    new_o, _ = wl.current_table_names(spark, sf)
    assert new_o != old_o
    assert not spark.catalog.tableExists(old_o)
    assert not os.path.isdir(
        os.path.join(wl._warehouse_dir(spark), old_o))
    ro, _ = wl.order_facts(spark, sf)  # routed now, reflects new data
    assert ro.count() == n0 - 1


def test_compact_fact_appends_live_feed(spark, tmp_path):
    """Continuous ingest: fresh fact rows land date-partitioned, the
    maintenance fold swaps them into the bucketed tables, and the
    DEFAULT query over the fed layout (a) includes the new rows and
    (b) still plans the join Exchange-free — the live-feed story the
    r10 verdict flagged as missing."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    n_orders, n_items = orders.count(), lineitem.count()
    # synthesize appends: 5 existing orders re-keyed past the max
    max_o = orders.select(F.max("o_orderkey")).first()[0]
    okey_t = dict(orders.dtypes)["o_orderkey"]
    lkey_t = dict(lineitem.dtypes)["l_orderkey"]
    new_orders = (orders.orderBy("o_orderkey").limit(5)
                  .withColumn("o_orderkey",
                              (F.col("o_orderkey") + max_o + 1).cast(okey_t)))
    seed_keys = orders.orderBy("o_orderkey").limit(5).select("o_orderkey")
    new_items = (
        lineitem.join(seed_keys,
                      lineitem.l_orderkey == seed_keys.o_orderkey)
        .drop("o_orderkey")
        .withColumn("l_orderkey",
                    (F.col("l_orderkey") + max_o + 1).cast(lkey_t))
    )
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", new_orders)
    wl.append_fact(spark, ap, "lineitem", new_items)
    folded = wl.compact_fact_appends(spark, sf, ap)
    assert folded["orders"] == 5
    assert folded["lineitem"] == new_items.count()
    o, l = wl.order_facts(spark, sf)
    assert o.count() == n_orders + 5
    assert l.count() == n_items + folded["lineitem"]
    # the fed layout still answers Exchange-free
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
            "l_extendedprice", "o_custkey")
        assert "Exchange hashpartitioning" not in _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # idempotent: appends were cleared, a second cycle folds nothing
    assert wl.compact_fact_appends(spark, sf, ap) == {
        "orders": 0, "lineitem": 0}


def _synth_order_appends(spark, sf, n=3):
    orders = load_table(spark, sf, "orders")
    okey_t = dict(orders.dtypes)["o_orderkey"]
    max_o = orders.select(F.max("o_orderkey")).first()[0]
    return (orders.orderBy("o_orderkey").limit(n)
            .withColumn("o_orderkey",
                        (F.col("o_orderkey") + max_o + 1).cast(okey_t)))


def test_crash_before_commit_loses_nothing(spark, tmp_path):
    """A fold that dies BEFORE the pointer commit leaves debris — a
    written-but-unreferenced next-generation table — but the old
    pointer stays live and the appends are intact: the next cycle
    folds them exactly once and sweeps the orphan generation."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", _synth_order_appends(spark, sf))
    n0 = wl.order_facts(spark, sf)[0].count()

    # simulate the crash: the staged generation exists, no commit
    wh = wl._warehouse_dir(spark)
    tag = wl._dirtag(sf, 32)
    orphan = wl._gen_name("orders", tag, 1)
    wl.write_fact_bucketed(
        load_table(spark, sf, "orders"), orphan, "o_orderkey", 32)
    assert wl.order_facts(spark, sf)[0].count() == n0  # old gen live

    folded = wl.compact_fact_appends(spark, sf, ap)
    assert folded["orders"] == 3  # folded exactly once
    assert wl.order_facts(spark, sf)[0].count() == n0 + 3
    # the crashed attempt's debris is gone (swept or overwritten by
    # the fold that reused generation 1)
    ptr = wl._read_pointer(wh, tag)
    assert ptr["tables"]["orders"] == orphan  # gen number was reused
    assert wl._append_files(os.path.join(ap, "orders")) == []


def test_concurrent_builds_serialize(spark, tmp_path):
    """ADVICE r10: the build was unsynchronized — concurrent server
    threads could race the rmtree/saveAsTable sequence. Hammer
    cobucketed_order_facts from 6 threads on a cold source: exactly
    one build must happen (same table names), every caller gets a
    readable pair, and the row counts agree."""
    from concurrent.futures import ThreadPoolExecutor

    sf = _fact_copy(tmp_path)
    n_orders = load_table(spark, sf, "orders").count()

    def build(_):
        o, l = wl.cobucketed_order_facts(spark, sf)
        return o.count()

    with ThreadPoolExecutor(max_workers=6) as ex:
        counts = list(ex.map(build, range(6)))
    assert counts == [n_orders] * 6
    assert wl.layout_available(spark, sf)


def test_crash_after_commit_never_double_folds(spark, tmp_path):
    """Crash AFTER the pointer commit but BEFORE append cleanup: the
    committed pointer's ``folded_files`` lists exactly the folded
    parts, so the next cycle retires them instead of folding them
    twice (the events compaction's double-fold hazard, replayed on
    the fact tables)."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", _synth_order_appends(spark, sf))
    n0 = wl.order_facts(spark, sf)[0].count()

    # fold with caller-managed lifecycle (files stay on disk), then
    # hand-write the pointer state a crash-before-cleanup leaves
    o_dir = os.path.join(ap, "orders")
    part_files = wl._append_files(o_dir)
    assert wl.compact_fact_appends(
        spark, sf, ap, clear_appends=False)["orders"] == 3
    wh = wl._warehouse_dir(spark)
    tag = wl._dirtag(sf, 32)
    ptr = wl._read_pointer(wh, tag)
    ptr["folded_files"] = part_files
    wl._commit_pointer(wh, tag, ptr)

    # next cycle: step 0 retires the already-folded files and folds
    # NOTHING new — the table keeps exactly one copy of the batch
    folded2 = wl.compact_fact_appends(spark, sf, ap)
    assert folded2["orders"] == 0
    assert wl.order_facts(spark, sf)[0].count() == n0 + 3
    assert wl._append_files(o_dir) == []


def test_restart_adopts_folded_layout(spark, tmp_path):
    """r11 review finding: folded rows exist nowhere but the bucketed
    tables once appends are cleared, and a fresh process's catalog
    does not know those tables. The manifest-driven ADOPTION path must
    re-register the surviving files instead of rebuilding from the
    bootstrap parquet (which would silently drop every folded row)."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", _synth_order_appends(spark, sf))
    assert wl.compact_fact_appends(spark, sf, ap)["orders"] == 3
    n_fed = wl.order_facts(spark, sf)[0].count()

    # simulate a process restart: files survive, catalog forgets.
    # (DROP on a managed table deletes its files, so stash + restore.)
    o_name, l_name = wl.current_table_names(spark, sf)
    wh = wl._warehouse_dir(spark)
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    for name in (o_name, l_name):
        shutil.copytree(os.path.join(wh, name), os.path.join(stash, name))
    for name in (o_name, l_name):
        spark.sql(f"DROP TABLE {name}")
        shutil.copytree(os.path.join(stash, name), os.path.join(wh, name))
    wl._BUILT.clear()
    assert not spark.catalog.tableExists(o_name)

    # "next process" asks for the layout: adoption, not rebuild
    o, _ = wl.cobucketed_order_facts(spark, sf)
    assert o.count() == n_fed  # the 3 folded rows survived the restart
    # and the adopted layout still joins Exchange-free
    _, l = wl.order_facts(spark, sf)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "Exchange hashpartitioning" not in _plan(
            l.join(o, l["l_orderkey"] == o["o_orderkey"])
            .select("l_extendedprice", "o_custkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_restart_during_fold_recovers_without_loss(spark, tmp_path):
    """ADVICE r11 (high): the old recovery keyed on catalog state that
    a process restart erases — for a crash mid-fold it rebuilt from
    the bootstrap source (dropping previously folded rows) and then
    deleted append files whose rows had never landed. Replay that
    exact scenario against the pointer protocol: fold once (rows now
    live ONLY in the bucketed tables), crash a second fold before its
    commit, restart, and verify nothing was lost and the pending
    appends fold exactly once."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", _synth_order_appends(spark, sf, 3))
    assert wl.compact_fact_appends(spark, sf, ap)["orders"] == 3
    n_fed = wl.order_facts(spark, sf)[0].count()

    # second batch lands; the fold for it "crashes" before commit —
    # a staged gen-2 table exists, the pointer still names gen 1
    wh = wl._warehouse_dir(spark)
    tag = wl._dirtag(sf, 32)
    o_name, l_name = wl.current_table_names(spark, sf)
    wl.append_fact(
        spark, ap, "orders",
        _synth_order_appends(spark, sf, 2).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)))
    orphan = wl._gen_name("orders", tag, 2)
    wl.write_fact_bucketed(
        spark.table(o_name), orphan, "o_orderkey", 32)

    # process restart: catalog forgets everything, files survive
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    for name in (o_name, l_name, orphan):
        shutil.copytree(os.path.join(wh, name), os.path.join(stash, name))
        spark.sql(f"DROP TABLE {name}")
        shutil.copytree(os.path.join(stash, name), os.path.join(wh, name))
    wl._BUILT.clear()

    # the next process serves the committed snapshot (first fold
    # included) and the pending batch folds exactly once
    assert wl.order_facts(spark, sf)[0].count() == n_fed
    assert wl.compact_fact_appends(spark, sf, ap)["orders"] == 2
    assert wl.order_facts(spark, sf)[0].count() == n_fed + 2
    assert wl._append_files(os.path.join(ap, "orders")) == []


def test_readers_resolve_one_snapshot_across_fold(spark, tmp_path):
    """r11 verdict Missing #3: the rename-swap design had a window
    where a reader could see new orders ∪ old lineitem. With the
    single-pointer commit a resolved pair is one snapshot by
    construction, and two-generation retention keeps that snapshot's
    files alive through the NEXT fold — a join planned just before
    the commit still executes correctly after it."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    o0, l0 = wl.order_facts(spark, sf)
    n_o0, n_l0 = o0.count(), l0.count()
    pre_join = l0.join(o0, l0["l_orderkey"] == o0["o_orderkey"]).select(
        "l_extendedprice", "o_custkey")
    n_join0 = pre_join.count()

    # fold new rows into BOTH tables
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    okey_t = dict(orders.dtypes)["o_orderkey"]
    lkey_t = dict(lineitem.dtypes)["l_orderkey"]
    max_o = orders.select(F.max("o_orderkey")).first()[0]
    seed = orders.orderBy("o_orderkey").limit(4).select("o_orderkey")
    new_o = (orders.join(seed, "o_orderkey")
             .withColumn("o_orderkey",
                         (F.col("o_orderkey") + max_o + 1).cast(okey_t)))
    new_l = (lineitem.join(seed, lineitem.l_orderkey == seed.o_orderkey)
             .drop("o_orderkey")
             .withColumn("l_orderkey",
                         (F.col("l_orderkey") + max_o + 1).cast(lkey_t)))
    n_new_l = new_l.count()
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", new_o)
    wl.append_fact(spark, ap, "lineitem", new_l)
    folded = wl.compact_fact_appends(spark, sf, ap)
    assert folded == {"orders": 4, "lineitem": n_new_l}

    # the pre-fold snapshot still answers — old totals, never a mix
    assert o0.count() == n_o0
    assert l0.count() == n_l0
    assert pre_join.count() == n_join0
    # a fresh resolution sees the complete new snapshot on BOTH sides
    o1, l1 = wl.order_facts(spark, sf)
    assert (o1.count(), l1.count()) == (n_o0 + 4, n_l0 + n_new_l)
    j1 = l1.join(o1, l1["l_orderkey"] == o1["o_orderkey"])
    assert j1.count() == n_join0 + n_new_l


def test_folded_layout_survives_source_noise(spark, tmp_path):
    """ADVICE r11 (medium): any mtime/size change to the raw sf_dir
    parquet used to trigger a rebuild-from-bootstrap that silently
    discarded every folded row. Once has_folds is set, the bucketed
    tables are canonical: source-file noise must not invalidate them;
    only the explicit invalidate_layout() may."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", _synth_order_appends(spark, sf))
    assert wl.compact_fact_appends(spark, sf, ap)["orders"] == 3
    n_fed = wl.order_facts(spark, sf)[0].count()

    # benign source noise: bump mtimes (a backup restore / re-copy)
    src = os.path.join(sf, "orders.parquet")
    paths = [src] if os.path.isfile(src) else [
        os.path.join(r, f) for r, _d, fs in os.walk(src) for f in fs]
    for p in paths:
        os.utime(p)
    wl._BUILT.clear()

    assert wl.layout_available(spark, sf)  # still current: folds rule
    assert wl.order_facts(spark, sf)[0].count() == n_fed

    # the explicit override is the only way to discard folded rows
    assert wl.invalidate_layout(spark, sf)
    assert not wl.layout_available(spark, sf)
    o, _ = wl.order_facts(spark, sf)  # raw bootstrap, folds gone
    assert o.count() == n_fed - 3


def test_bucketed_scan_survives_sort_only_plans(spark, tmp_path):
    """ADVICE r11 (medium): Spark's autoBucketedScan downgrades the
    bucketed scan for plans with no distribution-requiring operator —
    exactly the funnel's scan→sortWithinPartitions→mapInPandas shape,
    where a plain scan splits files at maxPartitionBytes and can split
    a user across partitions (silent undercounting). session.get_spark
    pins the conf off; this test pins BOTH the conf and the plan."""
    assert spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled") == "false"
    sf = _fact_copy(tmp_path)
    o, _ = wl.cobucketed_order_facts(spark, sf)
    plan = _plan(o.sortWithinPartitions("o_orderkey"))
    assert "Bucketed: true" in plan, plan


def test_fold_under_concurrent_queries(spark, tmp_path):
    """Task-6 probe: hammer the routed join from reader threads WHILE
    a fold commits. Every observed row count must equal the pre-fold
    total or the post-fold total — never a mix of new orders with old
    lineitem (the old swap window) and never a crash from GC'd files
    (two-generation retention keeps the pre-fold snapshot readable)."""
    import threading

    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)

    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    okey_t = dict(orders.dtypes)["o_orderkey"]
    lkey_t = dict(lineitem.dtypes)["l_orderkey"]
    max_o = orders.select(F.max("o_orderkey")).first()[0]
    seed = orders.orderBy("o_orderkey").limit(3).select("o_orderkey")
    new_o = (orders.join(seed, "o_orderkey")
             .withColumn("o_orderkey",
                         (F.col("o_orderkey") + max_o + 1).cast(okey_t)))
    new_l = (lineitem.join(seed, lineitem.l_orderkey == seed.o_orderkey)
             .drop("o_orderkey")
             .withColumn("l_orderkey",
                         (F.col("l_orderkey") + max_o + 1).cast(lkey_t)))
    n_new_l = new_l.count()
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", new_o)
    wl.append_fact(spark, ap, "lineitem", new_l)

    def join_count() -> int:
        o, l = wl.order_facts(spark, sf)
        return l.join(o, l["l_orderkey"] == o["o_orderkey"]).count()

    before = join_count()
    valid = {before, before + n_new_l}
    observed: list = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                observed.append(join_count())
            except Exception as e:  # a torn snapshot would land here
                observed.append(e)

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        folded = wl.compact_fact_appends(spark, sf, ap)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert folded == {"orders": 3, "lineitem": n_new_l}
    assert observed, "readers never completed a query"
    bad = [o for o in observed if not isinstance(o, int) or o not in valid]
    assert not bad, f"torn/failed reads during fold: {bad[:3]}"
    assert join_count() == before + n_new_l


# ------------------------------------------------------------------ gc


def test_gc_layouts_removes_only_unreachable(spark, tmp_path):
    """gc_layouts must (a) remove generation dirs no pointer names —
    debris of a build/fold that crashed before its commit — and stale
    pointer tmp-less dead tags, while (b) NEVER touching anything a
    live pointer references: current tables AND retired entries
    (in-flight readers may still be scanning them)."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    wh = wl._warehouse_dir(spark)
    tag = wl._dirtag(sf, 32)
    live = set(wl._read_pointer(wh, tag)["tables"].values())

    # fold once so the pointer carries a retired entry too
    ap = str(tmp_path / "appends")
    wl.append_fact(spark, ap, "orders", _synth_order_appends(spark, sf))
    assert wl.compact_fact_appends(spark, sf, ap)["orders"] == 3
    ptr = wl._read_pointer(wh, tag)
    retired = {n for e in ptr["retired"] for n in e["tables"]}
    current = set(ptr["tables"].values())
    assert retired, "fold must retire the superseded generation"

    # plant debris: a staged generation dir the pointer never named
    orphan = os.path.join(wh, f"wh_orders_b_{tag}_g99")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("x")

    out = wl.gc_layouts(spark)
    assert not os.path.isdir(orphan), "crashed-build debris must go"
    assert out["dirs_removed"] >= 1
    for name in current | retired:
        assert os.path.isdir(os.path.join(wh, name)), (
            f"gc removed live/retired table {name}")
    # the layout still serves, Exchange-free, with the folded rows
    o, _l = wl.order_facts(spark, sf)
    assert o.count() == load_table(spark, sf, "orders").count() + 3
    _ = live  # bootstrap names were retired by the fold — covered above


def test_fold_cycles_keep_dir_count_bounded(spark, tmp_path):
    """Repeated append→fold cycles must not grow the warehouse dir
    without bound: after each cycle (which runs gc_layouts) the tag's
    generation dirs are exactly the pointer's reachable set — current
    pair + two-snapshot retention, never the full history."""
    sf = _fact_copy(tmp_path)
    wl.cobucketed_order_facts(spark, sf)
    wh = wl._warehouse_dir(spark)
    tag = wl._dirtag(sf, 32)
    ap = str(tmp_path / "appends")
    for cycle in range(3):
        wl.append_fact(
            spark, ap, "orders", _synth_order_appends(spark, sf, n=2)
            .withColumn("o_orderkey", F.col("o_orderkey") + cycle * 100))
        wl.compact_fact_appends(spark, sf, ap)
        ptr = wl._read_pointer(wh, tag)
        reachable = set(ptr["tables"].values()) | {
            n for e in ptr.get("retired", ()) for n in e["tables"]}
        on_disk = {fn for fn in os.listdir(wh)
                   if fn.startswith((f"wh_orders_b_{tag}", f"wh_lineitem_b_{tag}"))}
        assert on_disk == reachable, (
            f"cycle {cycle}: disk {sorted(on_disk)} != "
            f"reachable {sorted(reachable)}")
        assert len(on_disk) <= 4  # current pair + <= 2 retired
