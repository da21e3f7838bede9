#!/usr/bin/env python
"""Same-methodology spot timer: construct+exec (noop sink) min-of-N
for the named queries. Usage:
  python plans/r16/time_queries.py tag name1 name2 ... [--n 5]
Prints one JSON line {"tag":..., "queries": {name: {"best": s,
"construct": s}}} — construct is the best df-build-only time, the
py4j/planning share of the per-pass cost.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 5


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag, names = args[0], args[1:]
    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    spark = get_spark("optiprism_spot_timer")
    # warm JVM + python workers once
    QUERIES["seg_dau"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        fn = QUERIES[name]
        best = cbest = float("inf")
        for _ in range(N):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best = min(best, t2 - t0)
            cbest = min(cbest, t1 - t0)
        out[name] = {"best": round(best, 3), "construct": round(cbest, 3)}
        print(f"  {name}: best={out[name]['best']} construct={out[name]['construct']}",
              flush=True)
    print(json.dumps({"tag": tag, "queries": out}))


if __name__ == "__main__":
    main()
