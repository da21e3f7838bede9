#!/usr/bin/env python
"""Time EVERY registered query once (noop sink, second pass for the
min when the first looks slow) at $SPARK_GRAFT_SF_DIR. Used to find
slow outliers outside the headline bench set (guide §1: measure
first, everywhere)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    spark = get_spark("optiprism_sweep", cpus=CPUS)
    sc = spark.sparkContext
    QUERIES["seg_dau"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out = {}
    for name, fn in QUERIES.items():
        sc.setJobDescription(f"sweep {name}")
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": str(e)[:200]}
                break
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            if el < 1.0:
                break
        else:
            pass
        if name not in out:
            out[name] = round(best, 3)
        print(f"{name}: {out[name]}", flush=True)
    sc.setJobDescription(None)
    with open("/tmp/sweep_all.json", "w") as f:
        json.dump(out, f, indent=1)
    slow = sorted((v, k) for k, v in out.items()
                  if isinstance(v, float))[-25:]
    print("\nSLOWEST 25:")
    for v, k in reversed(slow):
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
