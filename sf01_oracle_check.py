#!/usr/bin/env python
"""sf0.1 oracle spot-gate: one representative query per suite family,
differentially checked against DuckDB at 10× the driver's gate scale.

Correctness had only ever been proven at sf0.01; scale-dependent bugs
(decimal overflow, bucket edges, sampling coherence, auto-sizing that
changes with N) are invisible there. This picks the most
scale-sensitive oracled query in each suite and runs the same
row-count + column + value-hash comparison the driver's gate runs,
then writes one JSON file (default SF01_ORACLE_r09.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.1")

#: per-suite pick, biased toward scale-sensitive shapes: sampling
#: coherence (estimate), auto-sizing (similarity), bucket edges
#: (dedup LSH, percentiles), decimal-width sums, heavy breakdowns
PREFERRED = [
    "alert_purchase_count_daily",
    "asm_pack_sequences",
    "attr_last_touch_revenue",
    "catalog_materialized_property",
    "dedup_lsh_near_pairs",
    "eng_stickiness_weekly",
    "est_funnel_3step_sampled",
    "exp_view_to_purchase",
    "funnel_machine_breakdown",
    "ingest_geo_mmdb_counts",
    "multimodal_decoded_stats",
    "path_forward_from_signup",
    "event_records_search_purchases",
    "retention_weekly_signup_purchase",
    "rollup_percentile_value_by_type",
    "segment_historical_count",
    "dedup_embedding_cosine_ivf_auto",
    "text_bpe_segments",
    "wh_revenue_by_nation",
    "win_period_compare",
    # segmentation gets two: decimal-cast sums and percentile edges
    "seg_sum_value_daily_by_type",
    "seg_percentiles_by_type",
    # r10: routed/approx surfaces + the co-bucketed fact join + the
    # sketch-percentile path also carry 10x-scale evidence
    "retention_cohort_sizes_rollup",
    "seg_rollup_dau_by_week_approx",
    "qsketch_percentile_value_by_type",
    "wh_revenue_by_nation_bucketed",
    # r11: the bucketed EXISTS semi-join, plus r10-new surfaces whose
    # shapes are scale-sensitive (banded OR-amplified LSH bucket
    # edges, funnel any-order + last-touch tie-breaks, HT-scaled
    # retention estimates)
    "wh_order_priority_bucketed",
    "dedup_embedding_cosine_lsh_banded",
    "funnel_machine_any_order_touch_last",
    "est_retention_weekly_sampled",
    # bin-edge arithmetic + ln rounding are the scale-sensitive parts
    # of the drift family
    "drift_psi_value_half_month",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SF01_ORACLE_r09.json")
    args = ap.parse_args()

    from optiprism_spark.registry import ORACLE_SQL, QUERIES
    from optiprism_spark.session import get_spark
    from tests._oracle import assert_frames_match, run_oracle

    # cover every suite: preferred picks first, then the first oracled
    # query of any suite the preferred list missed
    by_suite: dict[str, list[str]] = {}
    for n, f in QUERIES.items():
        by_suite.setdefault(f.__module__.rsplit(".", 1)[-1], []).append(n)
    picks = list(PREFERRED)
    covered = {QUERIES[n].__module__.rsplit(".", 1)[-1] for n in picks}
    for suite, names in sorted(by_suite.items()):
        if suite in covered:
            continue
        oracled = [n for n in names if n in ORACLE_SQL]
        if oracled:
            picks.append(oracled[0])

    spark = get_spark("optiprism_spark_sf01_oracle")
    results: dict[str, dict] = {}
    for name in picks:
        t0 = time.perf_counter()
        entry: dict = {"suite": QUERIES[name].__module__.rsplit(".", 1)[-1]}
        try:
            spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
            oracle_pdf = run_oracle(ORACLE_SQL[name], SF_DIR)
            assert_frames_match(spark_pdf, oracle_pdf, name)
            entry.update(passed=True, rows=len(spark_pdf), err=None)
        except Exception as e:  # record, keep sweeping
            entry.update(passed=False, rows=None,
                         err=f"{type(e).__name__}: {e}")
            traceback.print_exc()
        entry["secs"] = round(time.perf_counter() - t0, 2)
        results[name] = entry
        print(f"  {name}: {'PASS' if entry['passed'] else 'FAIL'} "
              f"({entry['secs']}s)", flush=True)

    n_pass = sum(1 for r in results.values() if r["passed"])
    payload = {
        "metric": "sf01_oracle_spot_gate",
        "sf_dir": SF_DIR,
        "checked": len(results),
        "passed": n_pass,
        "pass": n_pass == len(results),
        "queries": results,
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps({k: payload[k] for k in
                      ("metric", "checked", "passed", "pass")}))
    sys.exit(0 if payload["pass"] else 1)


if __name__ == "__main__":
    main()
