#!/usr/bin/env python
"""Differential fuzz sweep over the event-segmentation JSON DSL.

Runs N seeded random request bodies (tests/_fuzz_seg.gen_spec) through
the real serving path and compares each against independently-emitted
DuckDB SQL at the driver's correctness scale (sf0.01 by default) —
the query-level analogue of the driver's 50-query oracle gate, but
over the combinatorial DSL space instead of enumerated queries:
random time windows × global/per-event property filters (double,
string, JSON-int) × breakdowns × 1-3 metrics (count, uniques, DAU,
decimal-exact sum/avg/min/max over double and JSON-int properties,
two-level per-group counts). --suite funnel fuzzes the funnel DSL
instead (steps × windows × unique/non-unique/excludes/constants/
breakdown/session/touch modes vs the recursive-anchor-chain oracle);
--suite estimate layers the sampled-estimation semantics (random
md5 user-sample rate/seed, Horvitz-Thompson scaling of exactly the
engine's additive columns) over the segmentation spec space.
--suite paths / retention / attribution fuzz the journey operators
the same way (random anchors/steps/directions/budgets/excludes/time
ranges; cohort-return pairs, day/week, bounded/unbounded; random
touch sets x conversion x lookback x first/last model) vs their
suites' parameterized oracles. --suite all runs everything. The funnel sweep
found a real oracle bug on its first run: the x-vs-y tie at the
window boundary in constants mode (suites/funnel._attempt_lateral
y_cmp).

Output: one JSON line {"metric": "dsl_fuzz", "n": N, "failed": [...],
"pass": bool}. Failures carry the full spec so a seed reproduces with
pytest tests/test_fuzz_api_segmentation.py or directly.

Usage: python fuzz_check.py [--n 300] [--seed0 0] [--out FUZZ_rN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--n-funnel", type=int, default=70)
    ap.add_argument("--n-journeys", type=int, default=60)
    ap.add_argument("--n-rollup", type=int, default=100)
    ap.add_argument("--n-funnel-layout", type=int, default=50)
    ap.add_argument("--seed0", type=int, default=None,
                    help="base seed; default round*100000 so each round "
                         "explores new DSL space")
    ap.add_argument("--round", type=int, default=0, dest="round_no")
    ap.add_argument("--n-quality", type=int, default=80)
    ap.add_argument("--n-userday", type=int, default=80)
    ap.add_argument("--suite", default="all",
                    choices=["seg", "funnel", "paths", "retention",
                             "attribution", "estimate", "rollup",
                             "funnel_layout", "quality", "growth", "rfm",
                             "userday", "all"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.seed0 is None:
        args.seed0 = args.round_no * 100000

    from optiprism_spark.session import get_spark
    from tests import _fuzz_estimate, _fuzz_funnel, _fuzz_seg
    from tests._fuzz_journeys import (attribution_suite, growth_suite,
                                      paths_suite, retention_suite,
                                      rfm_suite)
    from tests._oracle import assert_frames_match, duckdb_connection

    spark = get_spark("optiprism_spark_fuzz")
    con = duckdb_connection(SF_DIR)
    t0 = time.time()
    failed, checked = [], {}
    jobs = []
    if args.suite in ("seg", "all"):
        jobs.append(("seg", _fuzz_seg, args.n))
    if args.suite in ("funnel", "all"):
        jobs.append(("funnel", _fuzz_funnel, args.n_funnel))
    if args.suite in ("paths", "all"):
        jobs.append(("paths", paths_suite, args.n_journeys))
    if args.suite in ("retention", "all"):
        jobs.append(("retention", retention_suite, args.n_journeys))
    if args.suite in ("attribution", "all"):
        jobs.append(("attribution", attribution_suite, args.n_journeys))
    if args.suite in ("growth", "all"):
        jobs.append(("growth", growth_suite, args.n_journeys))
    if args.suite in ("rfm", "all"):
        jobs.append(("rfm", rfm_suite, args.n_journeys))
    if args.suite in ("estimate", "all"):
        jobs.append(("estimate", _fuzz_estimate, args.n_journeys))
    if args.suite in ("rollup", "all"):
        from tests import _fuzz_rollup

        jobs.append(("rollup", _fuzz_rollup, args.n_rollup))
    if args.suite in ("quality", "all"):
        # r13: constraint-battery DSL (kinds x columns x thresholds x
        # time window x per-day grouping) vs independently-emitted SQL
        from tests import _fuzz_quality

        jobs.append(("quality", _fuzz_quality, args.n_quality))
    if args.suite in ("userday", "all"):
        # r16: the user-day serving tier — routed == raw over random
        # day-aligned windows x surfaces x audience set expressions
        from tests import _fuzz_userday

        jobs.append(("userday", _fuzz_userday, args.n_userday))
    if args.suite in ("funnel_layout", "all"):
        # bucketed/assume_partitioned vs shuffle differential — the
        # seam whose failure mode (split users) is silent undercount
        from tests import _fuzz_funnel_layout

        jobs.append(("funnel_layout", _fuzz_funnel_layout,
                     args.n_funnel_layout))
    routed_n = 0
    for suite, mod, n in jobs:
        done = 0
        for seed in range(args.seed0, args.seed0 + n):
            spec = mod.gen_spec(seed)
            try:
                if hasattr(mod, "run_check"):
                    # self-contained differential (routed-vs-raw): the
                    # raw Spark path is the oracle, itself fuzzed vs
                    # DuckDB by the seg suite
                    routed_n += int(
                        mod.run_check(spark, SF_DIR, spec)["routed"])
                else:
                    sdf = mod.run_spec(spark, SF_DIR, spec).toPandas()
                    odf = con.sql(mod.spec_to_sql(spec)).df()
                    assert_frames_match(sdf, odf, name=f"{suite} seed={seed}")
            except Exception as e:
                failed.append({
                    "suite": suite,
                    "seed": seed,
                    "err": f"{type(e).__name__}: {e}"[:500],
                    "spec": {k: str(v) for k, v in spec.items()},
                })
            done += 1
            if done % 50 == 0:
                print(f"# {suite} {done}/{n} checked, {len(failed)} failed, "
                      f"{time.time() - t0:.0f}s", file=sys.stderr)
        checked[suite] = done

    result = {
        "metric": "dsl_fuzz",
        "sf_dir": SF_DIR,
        "n": checked,
        "rollup_routed_n": routed_n,
        "seed0": args.seed0,
        "elapsed_sec": round(time.time() - t0, 1),
        "failed": failed,
        "pass": not failed,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
