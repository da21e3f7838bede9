"""Differential fuzzer for the estimation mode (sampled segmentation).

Reuses the segmentation fuzzer's spec space (minus behavioral
segments — the cohort/sample interplay has no registered precedent to
mirror) and layers the estimation semantics on both sides: the Spark
side runs estimated_event_segmentation over a user-coherent md5
sample at a random rate/seed; the SQL side injects the same sample
predicate into the scan and Horvitz-Thompson-scales exactly the
columns the engine scales (operators/estimate._is_additive: counts,
uniques, active-groups, SUM aggregates — ratio statistics and
pre-scaling formulas pass through).
"""

from __future__ import annotations

import random

from . import _fuzz_seg

RATES = (0.125, 0.25, 0.5)  # inverses 8/4/2: exact in double


def _additive(kind: str, agg) -> bool:
    if kind in ("countEvents", "countUniqueGroups", "dailyActive"):
        return True
    if kind in ("aggValue", "aggK"):
        return agg == "sum"
    return False  # countPerGroup (two-level avg), formula


def gen_spec(seed: int) -> dict:
    rng = random.Random(0xE57_0000 + seed)
    base = dict(_fuzz_seg.gen_spec(seed))
    base["segment"] = None
    base["rate"] = rng.choice(RATES)
    base["sample_seed"] = f"fz{rng.randint(0, 4)}"
    return base


def spec_to_sql(s: dict) -> str:
    pred = (
        f"CAST(('0x' || substr(md5('{s['sample_seed']}:' || "
        f"CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 "
        f"< {s['rate']}"
    )
    inner = _fuzz_seg.spec_to_sql(s, extra_pred=pred)
    inv = 1.0 / s["rate"]
    keys = ["bucket"] + ([s["breakdown"]] if s["breakdown"] else [])
    # {inv}e0: a double literal (2e0/4e0/8e0) — a plain decimal literal
    # would decimal-taint the DuckDB expression
    sel = keys + [
        f"q{qi} * {int(inv)}e0 AS q{qi}" if _additive(kind, agg) else f"q{qi}"
        for qi, (kind, agg) in enumerate(s["queries"])
    ]
    return f"SELECT {', '.join(sel)} FROM ({inner}) x"


def run_spec(spark, sf_dir: str, s: dict):
    from optiprism_spark.api import parse_event_segmentation
    from optiprism_spark.operators.aggregates import _query_alias
    from optiprism_spark.operators.estimate import estimated_event_segmentation
    from optiprism_spark.schema import load_table

    req = parse_event_segmentation(_fuzz_seg.spec_to_body(s))
    events = load_table(spark, sf_dir, "events")
    df = estimated_event_segmentation(events, req, s["rate"],
                                      seed=s["sample_seed"])
    renames = {
        _query_alias(0, qi, q): f"q{qi}"
        for qi, q in enumerate(req.events[0].queries)
    }
    return df.withColumnsRenamed(renames)
