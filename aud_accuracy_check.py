#!/usr/bin/env python
"""KMV estimate-regime accuracy at 10× scale: the sketched audience
venn vs the exact flags path on the sf1 corpus.

The registered query (`aud_venn_kmv_sketched`, K=8192) is exact
through sf0.1 (≤1.5k distinct users per event) — this harness is the
evidence for the OTHER regime: at sf1 each event type has ~15k
distinct users, well past a production-sized K, so the sketch
genuinely estimates. Gate: every venn field within 5/sqrt(K) relative
error of exact (~5σ of the KMV bound; 1/sqrt(K) ≈ 1.6% at K=4096),
per event-type pair.

Usage: python aud_accuracy_check.py [--dir /tmp/optiprism_sf1]
       [--k 4096] [--out AUD_ACCURACY_r12.json]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/optiprism_sf1")
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from optiprism_spark.operators.audience import (
        audience_venn_from_day_sketches,
        kmv_day_sketches,
    )
    from optiprism_spark.session import get_spark

    spark = get_spark("optiprism_aud_accuracy")
    ev = spark.read.parquet(os.path.join(args.dir, "events.parquet"))

    t0 = time.perf_counter()
    days = kmv_day_sketches(ev, None, k=args.k).localCheckpoint(eager=True)
    build_sec = round(time.perf_counter() - t0, 3)

    # exact per-pair venn from one distinct reduction
    d = ev.select("user_id", "event_type").distinct().localCheckpoint(
        eager=True)
    sizes = {r["event_type"]: r["n"] for r in
             d.groupBy("event_type").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    dims = sorted(sizes)
    bound = 5 / (args.k ** 0.5)
    pairs: dict[str, dict] = {}
    worst = 0.0
    for a, b in itertools.combinations(dims, 2):
        t1 = time.perf_counter()
        est = audience_venn_from_day_sketches(days, a, b, args.k).first()
        est_sec = round(time.perf_counter() - t1, 3)
        both = (
            d.filter(F.col("event_type").isin([a, b]))
            .groupBy("user_id")
            .agg(F.count_distinct("event_type").alias("c"))
            .filter("c = 2").count()
        )
        exact = {"users_a": sizes[a], "users_b": sizes[b], "both": both,
                 "union_users": sizes[a] + sizes[b] - both}
        errs = {f: abs(getattr(est, f) - exact[f]) / max(exact[f], 1)
                for f in exact}
        worst = max(worst, max(errs.values()))
        pairs[f"{a}|{b}"] = {
            "exact": exact,
            "est": {f: round(getattr(est, f), 1) for f in exact},
            "rel_err": {f: round(e, 5) for f, e in errs.items()},
            "est_sec": est_sec,
        }
    # r13: the KMV-served K×K matrix (overlap_matrix_from_day_sketches)
    # in the same estimate regime — one call answers every pair, so its
    # per-pair errors must match the pairwise venn bound, and its
    # wall-clock is the store-fold economics the route exists for
    from optiprism_spark.operators.audience import (
        overlap_matrix_from_day_sketches,
    )

    t2 = time.perf_counter()
    mat_rows = {(r.dim_a, r.dim_b): r for r in
                overlap_matrix_from_day_sketches(days, k=args.k).collect()}
    matrix_sec = round(time.perf_counter() - t2, 3)
    matrix_worst = 0.0
    matrix = {}
    for (a, b), r in sorted(mat_rows.items()):
        ex = pairs[f"{a}|{b}"]["exact"]
        errs = {
            "users_a": abs(r.users_a - ex["users_a"]) / max(ex["users_a"], 1),
            "users_b": abs(r.users_b - ex["users_b"]) / max(ex["users_b"], 1),
            "overlap": abs(r.overlap - ex["both"]) / max(ex["both"], 1),
        }
        matrix_worst = max(matrix_worst, max(errs.values()))
        matrix[f"{a}|{b}"] = {f: round(e, 5) for f, e in errs.items()}
    # r13: boolean set expressions from the store (common-theta
    # membership — the NOT case especially, which no union-only sketch
    # can do). Exact counterpart from the same distinct reduction.
    from optiprism_spark.operators.audience import (
        audience_set_count_from_day_sketches,
    )

    set_cases = {}
    set_worst = 0.0
    for a, b, c in itertools.islice(itertools.combinations(dims, 3), 3):
        expr = {"op": "and", "args": [
            {"ref": a}, {"ref": b}, {"op": "not", "args": [{"ref": c}]}]}
        t3 = time.perf_counter()
        est_n = audience_set_count_from_day_sketches(
            days, expr, k=args.k).first().n_users
        set_sec = round(time.perf_counter() - t3, 3)
        exact_n = (
            d.groupBy("user_id")
            .agg(F.max(F.col("event_type") == a).alias("fa"),
                 F.max(F.col("event_type") == b).alias("fb"),
                 F.max(F.col("event_type") == c).alias("fc"))
            .filter("fa AND fb AND NOT fc").count()
        )
        err = abs(est_n - exact_n) / max(exact_n, 1)
        set_worst = max(set_worst, err)
        set_cases[f"{a}&{b}&!{c}"] = {
            "exact": exact_n, "est": round(est_n, 1),
            "rel_err": round(err, 5), "est_sec": set_sec,
        }

    result = {
        "metric": "kmv_venn_accuracy",
        "dir": args.dir,
        "k": args.k,
        "distinct_users_per_dim": sizes,
        "sketch_build_sec": build_sec,
        "rel_err_bound": round(bound, 5),
        "worst_rel_err": round(worst, 5),
        "pairs": pairs,
        "matrix_sec": matrix_sec,
        "matrix_pairs": len(matrix),
        "matrix_rel_err": matrix,
        "matrix_worst_rel_err": round(matrix_worst, 5),
        "set_exprs": set_cases,
        "set_worst_rel_err": round(set_worst, 5),
        # set-difference estimates subtract two near-equal samples, so
        # the relative error vs the (smaller) result is gated at 2x
        # the per-set bound rather than the venn bound itself
        "pass": worst <= bound and matrix_worst <= bound
        and len(matrix) == len(pairs) and set_worst <= 2 * bound,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
