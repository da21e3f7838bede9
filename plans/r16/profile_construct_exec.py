#!/usr/bin/env python
"""Profiler: per-query driver-side plan-construction time vs execution
time (noop sink, min of N), plus job/stage counts. Guide §1: measure
first; §7.3: plan construction is single-process driver work and shows
up as 'nothing running'.

Usage: python plans/r16/profile_construct_exec.py [query ...]
Defaults to the headline set. Same session for all queries.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("PROFILE_PASSES", "4"))


def main() -> None:
    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        import bench
        names = bench.HEADLINE
    spark = get_spark("optiprism_profile", cpus=CPUS)
    sc = spark.sparkContext
    # warm JVM + python workers
    QUERIES["seg_dau"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    QUERIES["multimodal_features"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = QUERIES[name]
        constructs, execs = [], []
        tracker = sc.statusTracker()
        jobs_before = len(tracker.getJobIdsForGroup() or [])
        for i in range(PASSES):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name} pass {i}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            constructs.append(t1 - t0)
            execs.append(t2 - t1)
        sc.setJobDescription(None)
        out[name] = {
            "construct_min": round(min(constructs), 3),
            "construct_all": [round(x, 3) for x in constructs],
            "exec_min": round(min(execs), 3),
            "exec_all": [round(x, 3) for x in execs],
            "total_min": round(min(c + e for c, e in zip(constructs, execs)), 3),
        }
        print(f"{name}: construct={out[name]['construct_min']} exec={out[name]['exec_min']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
