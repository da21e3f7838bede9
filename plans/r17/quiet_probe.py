#!/usr/bin/env python
"""Load-aware min-of-N probe: before each timed pass, wait until the
host's 1-min load average settles below a threshold (co-tenant bursts
on this virtualized sandbox swing the same query 1.2..10 s), then run
one noop-forced pass. Reports min + the per-pass (load, sec) series so
the artifact shows WHICH passes were quiet. Usage:
  python plans/r17/quiet_probe.py [-n 5] [--sf DIR] [--load 1.0] q1 q2
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_quiet(threshold: float, max_wait: float = 600.0) -> float:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        l = load1()
        if l < threshold:
            return l
        time.sleep(10)
    return load1()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--load", type=float, default=1.0)
    ap.add_argument("--settle", type=float, default=20.0)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    spark = get_spark("optiprism_r17_quiet_probe", cpus=args.cpus)
    # warm: the bench's own two untimed warm-ups
    QUERIES["seg_dau"](spark, args.sf).write.format("noop").mode("overwrite").save()
    QUERIES["multimodal_features"](spark, args.sf).write.format(
        "noop").mode("overwrite").save()

    def control() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2 + 1) as s").write \
            .format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    control()
    out: dict = {"sf": args.sf, "queries": {}}
    for name in args.names:
        fn = QUERIES[name]
        series = []
        for _ in range(args.n):
            time.sleep(args.settle)  # let our own load decay
            l = wait_quiet(args.load)
            c = round(control(), 3)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            series.append({"load": l, "control": c,
                           "sec": round(time.perf_counter() - t0, 3)})
        quiet = [p for p in series if p["load"] < args.load
                 and p["control"] < 0.2]
        out["queries"][name] = {
            "min_sec": min(p["sec"] for p in series),
            "min_quiet_sec": (min(p["sec"] for p in quiet) if quiet else None),
            "passes": series,
        }
        print(json.dumps({name: out["queries"][name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
