"""Histogram-percentile rollup oracle suite (rollup.percentile_estimate).

The estimate is deterministic arithmetic over integer bin counts —
cumulative walk + linear interpolation — so the oracle reproduces the
SAME binned estimate from raw events (bins, cums, `q·N` target, and
the interpolation expression mirrored term-for-term). This checks the
estimator, while tests/test_rollup_hist.py separately bounds its
error against the exact percentile.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ..registry import query
from ..schema import load_table
from . import _sql as S

_EDGES = (1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0)
_QS = (0.5, 0.9)


def _hist_oracle() -> str:
    E = len(_EDGES)
    bin_cases = []
    for i in range(E + 1):
        if i == 0:
            cond = f"value < {_EDGES[0]}"
        elif i == E:
            cond = f"value >= {_EDGES[-1]}"
        else:
            cond = f"value >= {_EDGES[i - 1]} AND value < {_EDGES[i]}"
        bin_cases.append(
            f"SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS b{i}")
    cum = [" + ".join(f"b{j}" for j in range(i + 1)) for i in range(E + 1)]
    total = cum[E]

    def est(q: float) -> str:
        target = f"{q} * ({total})"
        arms = [f"WHEN ({cum[0]}) >= {target} THEN {_EDGES[0]}"]
        for i in range(1, E):
            lo, hi = _EDGES[i - 1], _EDGES[i]
            arms.append(
                f"WHEN ({cum[i]}) >= {target} THEN "
                f"{lo} + ({hi} - {lo}) * ({target} - ({cum[i - 1]})) / b{i}")
        chain = " ".join(arms)
        return (f"CASE WHEN ({total}) > 0 THEN "
                f"(CASE {chain} ELSE {_EDGES[-1]} END) END")

    ests = ", ".join(
        f"round({est(q)}, 6) AS p{int(round(q * 100))}_est" for q in _QS)
    return f"""
    WITH bins AS (
      SELECT event_type, {", ".join(bin_cases)}
      FROM events
      WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1
    )
    SELECT event_type, CAST({total} AS BIGINT) AS n, {ests}
    FROM bins
    """


@query("rollup_percentile_value_by_type", oracle=_hist_oracle())
def rollup_percentile_value_by_type(spark, sf_dir):
    """p50/p90 of `value` per event type answered from the rollup's
    mergeable histogram bins — the rollup's percentile path (exact
    percentiles fall back to raw by design; the bin-width-bounded
    estimate is what a dashboard latency budget buys)."""
    from ..dsl import QueryTime
    from ..exprs import full_filter
    from ..rollup import RollupSpec, build_rollup, percentile_estimate

    time = QueryTime.between(
        dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))
    events = load_table(spark, sf_dir, "events").filter(full_filter(time))
    spec = RollupSpec(histogram_props=(("value", _EDGES),))
    rollup = build_rollup(events, spec)
    return percentile_estimate(rollup, spec, "value", _QS,
                               dims=("event_type",))


def _qsketch_oracle() -> str:
    """Order-statistic oracle for the EXACT regime of the quantile
    sketch: with per-group totals under the sketch capacity k no
    compaction ever fires, so every level-0 buffer holds the full
    value multiset and ``QuantileSketch.quantiles`` degenerates to the
    deterministic rank statistic r = max(1, ceil(q*n)) (searchsorted
    on unit weights). DuckDB reproduces exactly that rank — hash
    equality, not a tolerance band. The compacting regime's rank-error
    bound is pinned separately in tests/test_qsketch.py."""
    arms = ", ".join(
        f"MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL({q} * n) AS BIGINT)) "
        f"THEN value END) AS p{int(round(q * 100))}_est"
        for q in _QS
    )
    return f"""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WHERE {S.ts_between(*S.T_FULL)}
    )
    SELECT event_type, MAX(n) AS n, {arms}
    FROM ranked GROUP BY event_type
    """


@query("qsketch_percentile_value_by_type", oracle=_qsketch_oracle())
def qsketch_percentile_value_by_type(spark, sf_dir):
    """p50/p90 of `value` per event type from the rollup's mergeable
    KLL-style quantile-sketch column (operators/qsketch.py): per-day
    per-type sketches fold at build time, merge across days at query
    time, and answer quantiles without touching raw events. k is sized
    above the per-group totals at oracle scales so the whole fold tree
    stays in the sketch's exact regime and the driver can hash-match
    the rank statistic (see _qsketch_oracle)."""
    from ..dsl import QueryTime
    from ..exprs import full_filter
    from ..operators.qsketch import sketch_percentile_estimate
    from ..rollup import RollupSpec, build_rollup

    time = QueryTime.between(
        dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))
    events = load_table(spark, sf_dir, "events").filter(full_filter(time))
    spec = RollupSpec(sketch_props=("value",), sketch_k=32768)
    rollup = build_rollup(events, spec)
    return sketch_percentile_estimate(
        rollup, spec, "value", _QS, dims=("event_type",))
