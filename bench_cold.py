#!/usr/bin/env python
"""Cold-cache bench datapoint (r15 verdict task 7).

Every BENCH_r{N}.json number is warm: min-of-N passes in a session
that has already listed the tables, read parquet footers, JIT'd the
codegen, and spawned Python workers. A 100 TB deployment's
first-query latency is dominated by exactly those costs. This harness
quantifies the gap on the frozen comparable-21 set:

- **cold pass**: a FRESH SparkSession runs each query exactly once,
  in registry order, with no warm-up of any kind. The first queries
  additionally absorb the one-time session costs (JVM warm-up, python
  worker pool, codegen cache) — that is the point: it is what a
  just-started cluster serves.
- **warm pass**: the same queries once more in the same session — the
  steady-state this process can reach (single pass, not min-of-N, so
  it is NOT comparable to BENCH_r{N}; compare cold vs warm only).
- The kernel page cache is dropped before the cold pass when the
  environment allows writing /proc/sys/vm/drop_caches (best-effort;
  the artifact records whether it happened).

Prints ONE JSON line:
  {"metric": "cold_comparable_total", "value": N, "unit": "sec",
   "warm_total": M, "cold_over_warm": R, "queries": {...},
   "fs_cache_dropped": bool, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def drop_fs_cache() -> bool:
    """Best-effort kernel page-cache drop (needs a writable
    /proc/sys/vm/drop_caches; containers often deny it)."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def main() -> None:
    from bench import COMPARABLE_21

    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    dropped = drop_fs_cache()
    spark = get_spark("optiprism_spark_bench_cold", cpus=CPUS)

    def one_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in COMPARABLE_21:
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    cold = one_pass()
    warm = one_pass()
    cold_total = round(sum(cold.values()), 3)
    warm_total = round(sum(warm.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps({
        "metric": "cold_comparable_total",
        "value": cold_total,
        "unit": "sec",
        "warm_total": warm_total,
        "cold_over_warm": round(cold_total / warm_total, 2),
        "queries": cold,
        "warm_queries": warm,
        "fs_cache_dropped": dropped,
        "sf": sf,
    })
    print(line)
    out = os.environ.get("BENCH_COLD_OUT")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
