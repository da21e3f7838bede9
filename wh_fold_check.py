#!/usr/bin/env python
"""Warehouse-layout maintenance economics at sf0.1: what does keeping
the co-bucketed fact layout current under a live feed cost?

Three numbers per cycle size (0.1%, 1%, 10% of the fact rows):
  - append_fact: the ingest-path write (plain L0 parts, no bucket)
  - compact_fact_appends: the staging + swap fold
  - full rebuild (write_fact_bucketed from scratch): the
    counterfactual a layout without an ingest story forces

The fold rewrites the whole bucketed table too (Spark has no
per-bucket commit on plain parquet), so at this scale fold ≈ rebuild
+ the append read — the honest result. What the fold buys is the
swap discipline (staged write + back-to-back renames narrow the
reader-visible window to two DDL ops; crash recovery via manifest —
NOT full reader isolation, which needs a transactional table format)
and the cheap O(batch) ingest write; on a
transactional lake (Delta/Iceberg) the same plan shape becomes a
per-bucket incremental commit. The harness also re-asserts the fed
layout still plans the fact⋈fact join Exchange-free after every
cycle.

Usage: python wh_fold_check.py [--out WH_FOLD_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from optiprism_spark import warehouse_layout as wl
    from optiprism_spark.schema import load_table
    from optiprism_spark.session import get_spark

    spark = get_spark("optiprism_wh_fold")
    work = tempfile.mkdtemp(prefix="wh_fold_")
    sf = os.path.join(work, "sf")
    os.makedirs(sf)
    for t in ("orders", "lineitem", "customer", "nation", "region",
              "supplier", "part", "events", "documents", "embeddings"):
        src = os.path.join(SF01, f"{t}.parquet")
        dst = os.path.join(sf, f"{t}.parquet")
        (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    t0 = time.perf_counter()
    wl.cobucketed_order_facts(spark, sf)
    build_sec = round(time.perf_counter() - t0, 3)

    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    n_orders = orders.count()
    okey_t = dict(orders.dtypes)["o_orderkey"]
    lkey_t = dict(lineitem.dtypes)["l_orderkey"]
    max_o = orders.select(F.max("o_orderkey")).first()[0]

    def synth(frac: float, shift: int):
        keys = orders.select("o_orderkey").sample(frac, seed=7)
        new_o = (orders.join(keys, "o_orderkey")
                 .withColumn("o_orderkey",
                             (F.col("o_orderkey") + shift).cast(okey_t)))
        new_l = (lineitem.join(
                    keys.withColumnRenamed("o_orderkey", "k"),
                    lineitem.l_orderkey == F.col("k")).drop("k")
                 .withColumn("l_orderkey",
                             (F.col("l_orderkey") + shift).cast(lkey_t)))
        return new_o, new_l

    results = {"layout_build_sec": build_sec, "orders_rows": n_orders,
               "cycles": {}}
    shift = int(max_o)
    for frac in (0.001, 0.01, 0.1):
        shift *= 4
        new_o, new_l = synth(frac, shift)
        ap_dir = os.path.join(work, f"appends_{frac}")
        t0 = time.perf_counter()
        wl.append_fact(spark, ap_dir, "orders", new_o)
        wl.append_fact(spark, ap_dir, "lineitem", new_l)
        append_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        folded = wl.compact_fact_appends(spark, sf, ap_dir)
        fold_sec = round(time.perf_counter() - t0, 3)
        # counterfactual: rebuild both bucketed tables from scratch at
        # the CURRENT (post-fold) size
        o_name, l_name = wl.current_table_names(spark, sf)
        t0 = time.perf_counter()
        for name, (table, key) in zip((o_name + "_rb", l_name + "_rb"),
                                      (("orders", "o_orderkey"),
                                       ("lineitem", "l_orderkey"))):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            wl.write_fact_bucketed(spark.table(name[:-3]), name, key, 32)
        rebuild_sec = round(time.perf_counter() - t0, 3)
        for name in (o_name + "_rb", l_name + "_rb"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        # the fed layout still answers Exchange-free
        o, l = wl.order_facts(spark, sf)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (l.join(o, l["l_orderkey"] == o["o_orderkey"])
                    .select("l_extendedprice", "o_custkey")
                    ._jdf.queryExecution().executedPlan().toString())
            exchange_free = "Exchange hashpartitioning" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        results["cycles"][str(frac)] = {
            "folded_orders": folded["orders"],
            "folded_lineitem": folded["lineitem"],
            "append_sec": append_sec,
            "fold_sec": fold_sec,
            "rebuild_sec": rebuild_sec,
            "exchange_free_after": exchange_free,
        }
        print(f"frac={frac}: append {append_sec}s fold {fold_sec}s "
              f"rebuild {rebuild_sec}s exchange_free={exchange_free}",
              file=sys.stderr)
    results["metric"] = "warehouse_fold_economics"
    results["pass"] = all(
        c["exchange_free_after"] and c["folded_orders"] > 0
        for c in results["cycles"].values())
    shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
