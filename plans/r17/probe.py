#!/usr/bin/env python
"""Quick same-session probe: min-of-N noop-forced seconds for named
registry queries plus the bench's control indicator.
Usage: python plans/r17/probe.py [-n 5] [--sf DIR] q1 q2 ...
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    spark = get_spark("optiprism_r17_probe", cpus=args.cpus)
    QUERIES["seg_dau"](spark, args.sf).write.format("noop").mode("overwrite").save()
    QUERIES["multimodal_features"](spark, args.sf).write.format("noop").mode("overwrite").save()

    def control() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2 + 1) as s").write \
            .format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    control()
    print(f"control={round(min(control() for _ in range(5)), 3)}")
    for name in args.names:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {round(best, 3)}")


if __name__ == "__main__":
    main()
