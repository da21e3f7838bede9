"""Declarative data-quality constraint validation (Deequ-style).

A training pipeline gates every snapshot delivery on a battery of
declared expectations — null rates, key uniqueness, value ranges,
categorical domains, format patterns, cross-table key integrity —
and refuses the delivery when any fails. The reference has no such
surface (its ingester trusts the SDK, `ingester/src/executor.rs`);
this extends the LLM-pipeline family (SURVEY "beyond the reference")
alongside `drift.table_profile`, which *describes* a snapshot where
this module *judges* one.

Design for 100 TB:

- Every row-metric constraint (completeness, in-range fraction,
  accepted-values fraction, pattern fraction, mean bounds, row
  count) compiles into expressions of ONE ``df.agg`` — a single
  partial-aggregated scan with map-side combine, final exchange of
  exactly one row. Adding a constraint adds an expression, never a
  scan.
- ``uniqueness`` adds ``count(distinct)``, which Catalyst plans as
  an Expand + two-stage aggregate — still one scan; for
  very-high-cardinality keys at 100 TB pass ``approx=True`` to swap
  in HyperLogLog++ (the exact path stays the oracle default, the
  same split as `table_profile`).
- ``ref_integrity`` is necessarily a join probe per (fk, dim) pair:
  the dim's distinct keys aggregate first (map-side combinable),
  then broadcast onto the fact scan when small (the common shape —
  dimension tables are small by definition); orphans are counted in
  the same pass. No shuffle of the fact table.
- The one-row aggregate unpivots to one row per constraint via
  ``stack`` — pure projection, no second pass.

Float determinism: ratio metrics are exact integer-count divisions
rounded to 9 decimals; means go through DECIMAL(28,6) exact sums
(`operators/aggregates.DECIMAL_T`, the engine-wide recipe) — both
partition-order independent and DuckDB-reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from .aggregates import DECIMAL_T

#: round ratio/mean metrics to this many decimals on both engines
METRIC_DIGITS = 9


def _spec(name: str, target: str, metric, lo: Optional[float],
          hi: Optional[float]) -> dict:
    """``metric`` is SQL expression text (the built-in constraint
    builders below) or a Column (custom callers) — validate() accepts
    both; the built-ins moved to parsed SQL because their Column
    trees were ~150 py4j round-trips per battery (guide §7.3)."""
    return {"name": name, "target": target, "metric": metric,
            "lo": lo, "hi": hi}


def _sql_str(v: str) -> str:
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _ratio(num: str, den: str) -> str:
    """Exact-count ratio as double, NULL when the denominator is 0
    (an empty frame neither passes nor fails a fraction constraint —
    `row_count_between` is the guard for emptiness)."""
    return (f"round(CASE WHEN {den} > 0 THEN cast({num} as double)"
            f" / cast({den} as double) END, {METRIC_DIGITS})")


def completeness(col: str, min_ratio: float = 1.0) -> dict:
    """Fraction of rows with ``col`` non-null >= min_ratio."""
    return _spec(f"completeness({col})", col,
                 _ratio(f"count(`{col}`)", "count(1)"), min_ratio, None)


def uniqueness(cols: Sequence[str] | str, min_ratio: float = 1.0,
               approx: bool = False) -> dict:
    """distinct(cols) / rows >= min_ratio (1.0 = a candidate key).

    ``approx=True``: HyperLogLog++ instead of the exact Expand-based
    count(distinct) — the 100 TB default for high-cardinality keys;
    keep exact for oracle-checked runs.

    NULL semantics are SQL's COUNT(DISTINCT ...): a tuple with any
    NULL component is not counted (DuckDB agrees, keeping oracles
    aligned); the approx path masks such tuples to NULL before
    sketching so both paths measure the same quantity.
    """
    names = [cols] if isinstance(cols, str) else list(cols)
    bt = ", ".join(f"`{c}`" for c in names)
    if approx:
        all_set = " AND ".join(f"`{c}` IS NOT NULL" for c in names)
        # sketch over the STRUCT, not a separator-joined string: a
        # value containing the separator would merge distinct tuples
        # and deterministically undercount (r13 review finding)
        distinct = (f"approx_count_distinct(CASE WHEN {all_set} "
                    f"THEN struct({bt}) END)")
    else:
        distinct = f"count(DISTINCT {bt})"
    label = ",".join(names)
    spec = _spec(f"uniqueness({label})", label,
                 _ratio(distinct, "count(1)"), min_ratio, None)
    if not approx:
        # tag the exact-distinct key set so validate() can re-plan a
        # multi-distinct battery without the Expand (see validate)
        spec["distinct_cols"] = names
    return spec


def in_range(col: str, lo: float, hi: float,
             min_ratio: float = 1.0) -> dict:
    """Fraction of NON-NULL values inside [lo, hi] >= min_ratio.
    Nulls are completeness's job — counting them here would make two
    constraints fail for one defect."""
    ok = (f"cast((`{col}` >= {float(lo)!r}D AND"
          f" `{col}` <= {float(hi)!r}D) as long)")
    return _spec(f"in_range({col})", col,
                 _ratio(f"sum({ok})", f"count(`{col}`)"), min_ratio, None)


def non_negative(col: str, min_ratio: float = 1.0) -> dict:
    ok = f"cast((`{col}` >= 0) as long)"
    return _spec(f"non_negative({col})", col,
                 _ratio(f"sum({ok})", f"count(`{col}`)"), min_ratio, None)


def accepted_values(col: str, values: Sequence[str],
                    min_ratio: float = 1.0) -> dict:
    """Fraction of non-null values in the accepted set >= min_ratio."""
    vs = ", ".join(_sql_str(str(v)) for v in values)
    ok = f"cast((`{col}` IN ({vs})) as long)"
    return _spec(f"accepted_values({col})", col,
                 _ratio(f"sum({ok})", f"count(`{col}`)"), min_ratio, None)


def matches_pattern(col: str, regex: str, min_ratio: float = 1.0) -> dict:
    """Fraction of non-null values fully matching ``regex``.

    The pattern is mirrored verbatim in the oracle's regexp_matches.
    BOTH engines are partial-match (Spark rlike and DuckDB
    regexp_matches each search for the pattern anywhere in the
    string) — that is why they agree on unanchored patterns. For
    full-string semantics the caller must anchor explicitly with
    ^...$; never rely on either engine anchoring for you."""
    ok = f"cast((`{col}` RLIKE {_sql_str(regex)}) as long)"
    return _spec(f"matches_pattern({col})", col,
                 _ratio(f"sum({ok})", f"count(`{col}`)"), min_ratio, None)


def mean_between(col: str, lo: float, hi: float) -> dict:
    """DECIMAL-exact mean of ``col`` within [lo, hi]."""
    mean = (f"round(cast(sum(cast(`{col}` as {DECIMAL_T})) as double)"
            f" / count(`{col}`), {METRIC_DIGITS})")
    return _spec(f"mean_between({col})", col, mean, lo, hi)


def row_count_between(lo: int, hi: Optional[int] = None) -> dict:
    return _spec("row_count", "*",
                 "cast(count(1) as double)", float(lo),
                 None if hi is None else float(hi))


def validate(df: DataFrame, constraints: Sequence[dict],
             by: Sequence[str] = ()) -> DataFrame:
    """Evaluate all row-metric constraints in ONE aggregation pass.

    Returns one row per constraint (× group when ``by`` is given):
    ``(*by, constraint, target, metric, lower_bound, upper_bound,
    passed)`` — ``passed`` is NULL-safe: a NULL metric (empty
    denominator) yields passed = false, surfacing the degenerate
    input instead of silently waving it through.

    ``by``: grouping columns (e.g. the ingest day) turn the battery
    into a quality-metric TIME SERIES — per-group metrics from the
    same single partial-aggregated scan, ready to feed
    `alerts.robust_anomaly_flags` ("did completeness drift this
    week?"). The unpivot stays a pure projection.
    """
    if not constraints:
        # stack(0, ...) is a plan-time error with a cryptic message;
        # an empty battery is a caller bug — fail loudly here
        raise ValueError("validate() requires at least one constraint")
    # TWO OR MORE exact count(DISTINCT) constraints in one aggregate
    # plan as an Expand — every input row duplicated once per distinct
    # group into the first exchange (guide §2.3: at 100 TB that is a
    # full extra copy of the scan flowing through the aggregate). With
    # no grouping the battery is a handful of single-row results, so
    # re-plan: each exact-distinct count becomes its own two-phase
    # aggregate (dedup the key grain map-side, then count — no
    # Expand), the remaining metrics keep the ONE partial-aggregated
    # scan, and the 1-row frames cross-join back together. Metric
    # arithmetic is identical (same integer counts, same double
    # division, same rounding), so results are bit-equal; only the
    # plan shape changes. Grouped batteries (``by``) keep the
    # single-aggregate shape — their 1-row-per-group join would cost
    # more than the Expand saves.
    distinct_idx = [] if by else [
        i for i, c in enumerate(constraints) if c.get("distinct_cols")
    ]
    if len(distinct_idx) >= 2:
        plain_aggs = [
            F.expr(f"{c['metric']} AS __m{i}")
            if isinstance(c["metric"], str) else c["metric"].alias(f"__m{i}")
            for i, c in enumerate(constraints) if i not in distinct_idx
        ]
        # the shared denominator count(1): one extra agg expression on
        # the plain pass (free — partial-aggregated with the rest)
        one = df.groupBy().agg(*plain_aggs, F.expr("count(1) AS __total"))
        for i in distinct_idx:
            cols = constraints[i]["distinct_cols"]
            grain = df.selectExpr(*[f"`{c}`" for c in cols])
            # count(DISTINCT ...) skips tuples with any NULL component
            for c in cols:
                grain = grain.filter(F.col(c).isNotNull())
            cnt = grain.distinct().groupBy().agg(
                F.expr(f"count(1) AS __d{i}"))
            one = one.crossJoin(cnt)
        one = one.select(
            *[F.col(f"__m{i}") for i in range(len(constraints))
              if i not in distinct_idx],
            *[F.expr(f"{_ratio(f'__d{i}', '__total')} AS __m{i}")
              for i in distinct_idx],
        )
    else:
        aggs = [
            F.expr(f"{c['metric']} AS __m{i}") if isinstance(c["metric"], str)
            else c["metric"].alias(f"__m{i}")
            for i, c in enumerate(constraints)
        ]
        one = (df.groupBy(*[F.col(b) for b in by]) if by else df.groupBy()
               ).agg(*aggs)
    # unpivot via stack: pure projection over the 1-row aggregate
    cells = []
    for i, c in enumerate(constraints):
        # cast bound literals to DOUBLE: bare 1.0 / 0.99 parse as
        # decimals of differing scales and break stack's type check
        lo = ("CAST(NULL AS DOUBLE)" if c["lo"] is None
              else f"CAST({float(c['lo'])!r} AS DOUBLE)")
        hi = ("CAST(NULL AS DOUBLE)" if c["hi"] is None
              else f"CAST({float(c['hi'])!r} AS DOUBLE)")
        nm = c["name"].replace("\\", "\\\\").replace("'", "\\'")
        tg = c["target"].replace("\\", "\\\\").replace("'", "\\'")
        cells.append(f"'{nm}', '{tg}', __m{i}, {lo}, {hi}")
    n = len(constraints)
    stacked = one.select(
        *[F.col(b) for b in by],
        F.expr(
            f"stack({n}, {', '.join(cells)}) AS "
            "(constraint, target, metric, lower_bound, upper_bound)"
        ),
    )
    return stacked.select(
        "*",
        (
            F.col("metric").isNotNull()
            & (F.col("lower_bound").isNull()
               | (F.col("metric") >= F.col("lower_bound")))
            & (F.col("upper_bound").isNull()
               | (F.col("metric") <= F.col("upper_bound")))
        ).alias("passed"),
    )


def ref_integrity(fact: DataFrame, fk_col: str,
                  dim: DataFrame, pk_col: str,
                  max_orphan_ratio: float = 0.0,
                  broadcast_dim: bool = True) -> DataFrame:
    """Referential integrity: fraction of non-null ``fact.fk_col``
    values with NO match in ``dim.pk_col`` (orphans), constrained to
    <= ``max_orphan_ratio``.

    Plan shape: the dim side reduces to its distinct keys first
    (map-side combinable) and broadcasts onto the fact scan
    (``broadcast_dim=True``, the right call for real dimension
    tables); orphan and total counts come out of the same single
    aggregation over the joined scan — the fact table is never
    shuffled. For a fk whose dim does NOT fit in memory pass
    ``broadcast_dim=False`` and Spark plans a shuffled hash join on
    the key — the unavoidable shape at that size.

    Same output schema as `validate`, so batteries union cleanly.
    """
    keys = dim.select(F.col(pk_col).alias("__pk")).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    probe = (
        fact.select(F.col(fk_col).alias("__fk"))
        .where(F.col("__fk").isNotNull())
        .join(keys, F.col("__fk") == F.col("__pk"), "left")
    )
    name = f"ref_integrity({fk_col}->{pk_col})"
    return (
        probe.agg(
            F.round(
                F.sum(F.col("__pk").isNull().cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                METRIC_DIGITS,
            ).alias("metric")
        )
        .select(
            F.lit(name).alias("constraint"),
            F.lit(fk_col).alias("target"),
            "metric",
            F.lit(None).cast("double").alias("lower_bound"),
            F.lit(float(max_orphan_ratio)).alias("upper_bound"),
            (F.col("metric").isNotNull()
             & (F.col("metric") <= F.lit(float(max_orphan_ratio))))
            .alias("passed"),
        )
    )


def freshness(col: str, max_age_hours: float, as_of: str) -> dict:
    """Data freshness: hours between ``as_of`` and max(``col``) must
    be <= ``max_age_hours`` — the 'did yesterday's delivery actually
    arrive' gate. ``as_of`` is an explicit timestamp string (callers
    pass their clock; an implicit now() would make the battery
    non-deterministic and oracle-uncheckable). Metric = the age in
    hours (rounded to 9); an all-NULL column yields NULL age and
    therefore FAILS, surfacing the empty delivery."""
    age = F.round(
        (F.lit(as_of).cast("timestamp").cast("double")
         - F.max(F.col(col)).cast("timestamp").cast("double")) / 3600.0,
        METRIC_DIGITS,
    )
    return _spec(f"freshness({col})", col, age, None, float(max_age_hours))
