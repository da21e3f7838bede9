#!/usr/bin/env python
"""Full-registry oracle check: every registered query vs DuckDB at
$ORACLE_SF_DIR (default sf0.01). Methodology identical to
sf01_oracle_check.py (rows + columns + value match via
tests._oracle.assert_frames_match). Used by the optimization rounds to
prove a restructured query is still oracle-equivalent before/after.

Usage: python full_registry_check.py [--out FILE] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/full_registry_check.json")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from optiprism_spark.registry import ORACLE_SQL, QUERIES
    from optiprism_spark.session import get_spark
    from tests._oracle import assert_frames_match, run_oracle

    names = list(QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    spark = get_spark("optiprism_full_registry_check")
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
            oracle_pdf = run_oracle(ORACLE_SQL[name], SF_DIR)
            assert_frames_match(spark_pdf, oracle_pdf, name)
            entry = {"passed": True, "rows": len(spark_pdf), "err": None}
        except Exception as e:  # record, keep sweeping
            entry = {"passed": False, "rows": None,
                     "err": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        entry["secs"] = round(time.perf_counter() - t0, 2)
        results[name] = entry
        print(f"  {name}: {'PASS' if entry['passed'] else 'FAIL'} "
              f"({entry['secs']}s)", flush=True)

    n_pass = sum(1 for r in results.values() if r["passed"])
    payload = {
        "metric": "full_registry_oracle_check",
        "sf_dir": SF_DIR,
        "checked": len(results),
        "passed": n_pass,
        "pass": n_pass == len(results),
        "failures": [n for n, r in results.items() if not r["passed"]],
        "queries": results,
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps({k: payload[k] for k in
                      ("metric", "checked", "passed", "pass", "failures")}))
    sys.exit(0 if payload["pass"] else 1)


if __name__ == "__main__":
    main()
