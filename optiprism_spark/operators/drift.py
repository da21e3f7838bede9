"""Data-quality profiling and distribution-drift detection.

A training-data pipeline revalidates every snapshot delivery: did a
column's null rate jump, did its distribution shift between two
periods (a data-vendor change, an instrumentation bug)? Two
operators, both pure column expressions over one or two full scans —
at 100 TB they are map-side-combinable partial aggregates with a
final exchange of at most ``bins`` (or group-count) rows:

- ``table_profile``: per-group column statistics (rows, nulls,
  decimal-exact mean, min/max) in ONE scan — every statistic is an
  agg expression in a single groupBy, so Spark computes them all in
  one partial/final aggregation pass.
- ``distribution_drift``: Population Stability Index between two
  row-populations of the same frame over equal-width bins. Two scans
  (one 1-row bounds aggregate, one histogram), bin arithmetic written
  identically to the DuckDB oracle (floor((v-lo)/(hi-lo)*bins)), and
  the ln-based PSI contribution rounded to 9 decimals on both engines
  (the win_logarithmic precedent: libm vs JVM ln agree far beyond
  1e-9).

The reference has no drift surface (its ingest trusts the SDK); this
extends the LLM-pipeline operator family (SURVEY "beyond the
reference").
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from .aggregates import DECIMAL_T

#: Laplace-style smoothing mass per bin: keeps ln() finite on empty
#: bins and makes tiny-count contributions stable
PSI_SMOOTH = 0.5


def table_profile(
    df: DataFrame,
    num_cols: Sequence[str],
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group numeric column profile in one aggregation pass.

    Mean goes through DECIMAL(28,6) exact summation (the engine-wide
    float-determinism recipe, operators/aggregates.DECIMAL_T) and is
    rounded to 9 decimals, so the result is partition-order
    independent and DuckDB-reproducible bit-for-bit."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}_nulls"),
            F.round(
                F.sum(col.cast(DECIMAL_T)).cast("double") / F.count(col), 9
            ).alias(f"{c}_mean"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            # exact distinct rides the same pass via Catalyst's Expand
            # (one scan, two agg phases); at extreme cardinalities a
            # deployment swaps this for approx_count_distinct
            F.countDistinct(col).alias(f"{c}_distinct"),
        ]
    grouped = df.groupBy(*[F.col(b) for b in by]) if by else df.groupBy()
    return grouped.agg(*aggs)


def _bucket_expr(v: Column, lo: Column, hi: Column, bins: int) -> Column:
    """Equal-width bin in [1, bins] — written as plain double
    arithmetic (NOT width_bucket, whose edge semantics differ across
    engines) so the oracle can replicate it token-for-token: the max
    value folds into the top bin, everything else floors."""
    return (
        F.when(v >= hi, F.lit(bins))
        .otherwise(F.floor((v - lo) / (hi - lo) * bins) + 1)
        .cast("int")
    )


def distribution_drift(
    df: DataFrame,
    col: str,
    split: Column,
    bins: int = 10,
) -> DataFrame:
    """PSI between the rows where ``split`` is true (expected /
    baseline population) and where it is false (actual population).

    Returns one row per occupied bin: (bucket, n_expected, n_actual,
    psi_contrib) — ``sum(psi_contrib)`` is the PSI; per-bin rows keep
    the diagnosis local (WHICH part of the distribution moved). Bin
    bounds come from the GLOBAL min/max of both populations, so the
    two histograms are aligned by construction.

    Scale shape: a 1-row global bounds aggregate broadcast onto the
    scan (no crossJoin, no driver round-trip in the plan), one
    partial-agg histogram, and a ``bins``-row window for the totals.
    """
    v = F.col(col)
    # rows whose split is NULL (e.g. a NULL timestamp) belong to
    # NEITHER population — filter them explicitly rather than letting
    # three-valued logic drop them from one sum and not the other
    # (r11 review finding: the SQL oracle's CASE ELSE branch counted
    # them as actual while Spark's boolean sums skipped them)
    pop = df.filter(v.isNotNull() & split.isNotNull())
    bounds = (
        pop.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
        .withColumn("__k", F.lit(1))
    )
    binned = (
        pop.withColumn("__k", F.lit(1))
        .join(F.broadcast(bounds), "__k")
        .select(
            _bucket_expr(v, F.col("__lo"), F.col("__hi"), bins).alias(
                "bucket"),
            split.cast("boolean").alias("__exp"),
        )
    )
    hist = binned.groupBy("bucket").agg(
        F.sum(F.col("__exp").cast("long")).alias("n_expected"),
        F.sum((~F.col("__exp")).cast("long")).alias("n_actual"),
    )
    return _psi_contribs(hist, "bucket", bins)


def categorical_drift(df: DataFrame, col: str, split: Column) -> DataFrame:
    """PSI over a CATEGORICAL column's observed values (no binning):
    one row per category with its expected/actual counts and PSI
    contribution. The smoothing mass scales with the observed
    category count, mirroring the numeric variant's per-bin mass —
    an unseen-in-one-population category contributes a large, finite
    term instead of ln(0). One partial-aggregated scan; the final
    window runs over n_categories rows."""
    v = F.col(col)
    hist = (
        df.filter(v.isNotNull() & split.isNotNull())
        .groupBy(v.alias("category"))
        .agg(
            F.sum(split.cast("long")).alias("n_expected"),
            F.sum((~split).cast("long")).alias("n_actual"),
        )
    )
    # n distinct categories is data-dependent: count via a window so
    # the smoothing denominator stays inside the one plan
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    return _psi_contribs(hist, "category", F.count(F.lit(1)).over(w))


def _psi_contribs(hist: DataFrame, key: str, n_cells) -> DataFrame:
    """Shared PSI tail: smoothed proportions + rounded ln term over a
    (key, n_expected, n_actual) histogram. ``n_cells`` is the
    smoothing denominator's cell count — a literal int for binned
    drift, a window expression for categorical."""
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    te = F.sum("n_expected").over(w)
    ta = F.sum("n_actual").over(w)
    cells = F.lit(n_cells) if isinstance(n_cells, int) else n_cells
    pe = (F.col("n_expected") + F.lit(PSI_SMOOTH)) / (
        te + F.lit(PSI_SMOOTH) * cells)
    pa = (F.col("n_actual") + F.lit(PSI_SMOOTH)) / (
        ta + F.lit(PSI_SMOOTH) * cells)
    return hist.select(
        key,
        "n_expected",
        "n_actual",
        F.round((pe - pa) * F.log(pe / pa), 9).alias("psi_contrib"),
    )
