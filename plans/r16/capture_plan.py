#!/usr/bin/env python
"""Capture .explain('formatted') for named queries to plans/r16/<name>_<tag>.txt.

Usage: python plans/r16/capture_plan.py <tag> name1 name2 ...
"""
import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("optiprism_plan_capture")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = f"/root/repo/plans/r16/{name}_{tag}.txt"
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({plan.count('Exchange')} Exchange nodes)")


if __name__ == "__main__":
    main()
