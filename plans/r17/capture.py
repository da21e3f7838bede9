#!/usr/bin/env python
"""Capture .explain('formatted') for named registry queries into
plans/r17/<query>_<suffix>.txt. Usage:
  python plans/r17/capture.py before dq_events_battery asm_importance_sample ...
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from optiprism_spark.registry import QUERIES
    from optiprism_spark.session import get_spark

    spark = get_spark("optiprism_r17_plans", cpus="8")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = f"/root/repo/plans/r17/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(f"{name}: exchanges={txt.count('Exchange')} "
              f"expand={txt.count('Expand')} scans={txt.count('Scan parquet')}"
              f" -> {out}")


if __name__ == "__main__":
    main()
