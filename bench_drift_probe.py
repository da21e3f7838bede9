#!/usr/bin/env python
"""Forensic probe for the r9→r10 comparable-21 drift (+7.3%).

Hypotheses from VERDICT r10 #3, tested in one process:
  H1 layout/metastore tax — structurally impossible for the
     comparable set: all 21 comparable queries run BEFORE the first
     bucketed-table build in bench.py's HEADLINE order, and the
     catalog is in-memory per process. Verified by timing the three
     worst drifters with the layout never built (this probe) vs the
     r10 numbers recorded with it built later in the same session.
  H2 host/co-tenant noise — tested with min-of-5 (bench uses
     min-of-3) on the three worst drifters; if the min-of-5 lands at
     or under the r8/r9 numbers, the drift was sampling noise on a
     busy box, not code.

Prints one JSON line with min-of-5 per drifter plus every sample.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DRIFTERS = [
    # query, r8, r9, r10 (BENCH_r{8,9,10}.json), like-for-like best
    ("retention_weekly_signup_purchase", None, 0.397, 0.538),
    ("eng_stickiness_weekly", None, 0.313, 0.416),
    ("ingest_ua_browser_counts", 0.775, 0.720, 0.845),
    ("wh_revenue_by_nation", 1.072, 1.014, 1.207),
    ("sim_cosine_topk_ivf", 0.826, 0.925, 1.069),
]


def main() -> None:
    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark
    from optiprism_spark.warehouse_layout import layout_available

    spark = get_spark("optiprism_drift_probe",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # warm, same as bench.py
    QUERIES["seg_dau"](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    QUERIES["multimodal_features"](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    assert not layout_available(spark, SF_DIR)  # H1: no layout built

    out = {}
    for name, r8, r9, r10 in DRIFTERS:
        fn = QUERIES[name]
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min5": min(samples), "samples": samples,
                     "r8": r8, "r9": r9, "r10": r10}
        print(f"{name}: min5={min(samples)} samples={samples}",
              file=sys.stderr)
    print(json.dumps({"metric": "bench_drift_probe", "sf_dir": SF_DIR,
                      "queries": out}))


if __name__ == "__main__":
    main()
