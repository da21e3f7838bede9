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
    approx_distinct: bool = False,
) -> DataFrame:
    """Per-group numeric column profile in one aggregation pass.

    Mean goes through DECIMAL(28,6) exact summation (the engine-wide
    float-determinism recipe, operators/aggregates.DECIMAL_T) and is
    rounded to 9 decimals, so the result is partition-order
    independent and DuckDB-reproducible bit-for-bit.

    ``approx_distinct=True`` swaps the exact countDistinct (a Catalyst
    Expand — doubles the shuffled rows per distinct column) for
    HyperLogLog++ — the right default when profiling very-high-
    cardinality columns at 100 TB; the exact path stays the
    oracle-checkable default."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    distinct = (F.approx_count_distinct if approx_distinct
                else F.countDistinct)
    for c in num_cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}_nulls"),
            F.round(
                F.sum(col.cast(DECIMAL_T)).cast("double") / F.count(col), 9
            ).alias(f"{c}_mean"),
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            distinct(col).alias(f"{c}_distinct"),
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


#: default cap on categorical-drift categories: bounds the histogram,
#: the broadcast, and the final window regardless of the column's true
#: cardinality (same spirit as dedup's max_bucket) — event-type-like
#: columns sail under it untouched, URL/user-agent-like columns fold
#: their tail into OTHER_CATEGORY
MAX_CATEGORIES = 1000
OTHER_CATEGORY = "__other__"


def categorical_drift(
    df: DataFrame,
    col: str,
    split: Column,
    max_categories: Optional[int] = MAX_CATEGORIES,
) -> DataFrame:
    """PSI over a CATEGORICAL column's observed values (no binning):
    one row per category with its expected/actual counts and PSI
    contribution. The smoothing mass scales with the observed
    category count, mirroring the numeric variant's per-bin mass —
    an unseen-in-one-population category contributes a large, finite
    term instead of ln(0).

    ``max_categories`` guards unbounded cardinality (r11 verdict
    Missing #4): only the top-K categories by total count (ties by
    category, deterministic) keep their own row; the tail folds into
    one ``__other__`` bucket. The top-K is a distributed TakeOrdered
    + broadcast anti-join — no single-partition sort of the full
    category set — so the operator is safe to point at a URL or
    user-agent column. The final PSI window then runs over ≤ K+1 rows
    (categorical PSI over a megacategory column is statistically
    meaningless anyway — the smoothed tail mass dominates; the
    ``__other__`` fold keeps the index well-defined instead)."""
    v = F.col(col)
    hist = (
        df.filter(v.isNotNull() & split.isNotNull())
        .groupBy(v.cast("string").alias("category"))
        .agg(
            F.sum(split.cast("long")).alias("n_expected"),
            F.sum((~split).cast("long")).alias("n_actual"),
        )
    )
    return categorical_psi_tail(hist, max_categories)


def categorical_psi_tail(
    hist: DataFrame, max_categories: Optional[int] = MAX_CATEGORIES
) -> DataFrame:
    """Top-K guard + PSI over a prebuilt (category, n_expected,
    n_actual) histogram — shared by the raw scan (categorical_drift)
    and the rollup fold (rollup.categorical_psi_from_rollup), so the
    two paths are expression-identical from the histogram down and
    hash-match by construction."""
    if max_categories is not None:
        total = F.col("n_expected") + F.col("n_actual")
        top = hist.orderBy(total.desc(), F.col("category").asc()).limit(
            int(max_categories))
        tail = (
            hist.join(F.broadcast(top.select("category")),
                      "category", "left_anti")
            .groupBy()
            .agg(F.sum("n_expected").alias("n_expected"),
                 F.sum("n_actual").alias("n_actual"))
            .select(F.lit(OTHER_CATEGORY).alias("category"),
                    "n_expected", "n_actual")
            # empty tail aggregates to one all-NULL row — drop it
            .filter(F.col("n_expected").isNotNull())
        )
        hist = top.unionByName(tail)
    # n distinct (kept) categories is data-dependent: count via a
    # window so the smoothing denominator stays inside the one plan
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return _psi_contribs(hist, "category", F.count(F.lit(1)).over(w))


def _psi_contribs(hist: DataFrame, key: str, n_cells) -> DataFrame:
    """Shared PSI tail: smoothed proportions + rounded ln term over a
    (key, n_expected, n_actual) histogram. ``n_cells`` is the
    smoothing denominator's cell count — a literal int for binned
    drift, a window expression for categorical.

    The window is partitioned by a constant: semantically identical
    to the unpartitioned global window (the input is ≤ bins /
    max_categories+1 rows post-aggregation, one partition either
    way), but it keeps Spark's 'No Partition Defined for Window'
    warning out of the logs — that warning must stay meaningful for
    the one place it someday isn't benign (r11 verdict watch item)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
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


def _hist_bin_cond(v: Column, edges: Sequence[float], i: int) -> Column:
    """Bin membership for DDL-time edges — written IDENTICALLY to the
    rollup's histogram build (rollup.build_rollup) so a PSI folded
    from stored bins is bit-equal to one computed from raw rows:
    bin 0 = v < edges[0], bin i = [edges[i-1], edges[i]),
    bin len(edges) = v >= edges[-1]."""
    if i == 0:
        return v < F.lit(edges[0])
    if i == len(edges):
        return v >= F.lit(edges[-1])
    return (v >= F.lit(edges[i - 1])) & (v < F.lit(edges[i]))


def _hist_bin_cond_sql(col_sql: str, edges: Sequence[float], i: int) -> str:
    """SQL-text twin of _hist_bin_cond (identical comparisons; double
    literals carry the D suffix so they parse as DOUBLE, not DECIMAL).
    Parsed-SQL construction exists because building 2×n_bins when/sum
    Column trees is ~8 py4j round-trips per tree — several hundred ms
    of driver time per query (guide §7.3)."""
    if i == 0:
        return f"{col_sql} < {edges[0]!r}D"
    if i == len(edges):
        return f"{col_sql} >= {edges[-1]!r}D"
    return f"({col_sql} >= {edges[i - 1]!r}D AND {col_sql} < {edges[i]!r}D)"


def _psi_from_bin_sums(row: DataFrame, n_bins: int) -> DataFrame:
    """Window-free PSI tail over a ONE-ROW frame of per-bin sums
    (columns __e0..__e{n-1}, __a0..__a{n-1}): totals are plain column
    sums inside the row, bins unpivot via stack — no exchange, no
    window, the final stage is n_bins rows from one aggregate row."""
    # one parsed expression per total instead of n_bins py4j `+` calls
    te = F.expr(" + ".join(f"__e{i}" for i in range(n_bins)))
    ta = F.expr(" + ".join(f"__a{i}" for i in range(n_bins)))
    stack_args = ", ".join(
        f"{i}, __e{i}, __a{i}" for i in range(n_bins))
    unpivoted = row.select(
        F.expr(f"stack({n_bins}, {stack_args}) "
               "AS (bucket, n_expected, n_actual)"),
        te.alias("__te"),
        ta.alias("__ta"),
    )
    pe = (F.col("n_expected") + F.lit(PSI_SMOOTH)) / (
        F.col("__te") + F.lit(PSI_SMOOTH) * n_bins)
    pa = (F.col("n_actual") + F.lit(PSI_SMOOTH)) / (
        F.col("__ta") + F.lit(PSI_SMOOTH) * n_bins)
    return unpivoted.select(
        "bucket",
        "n_expected",
        "n_actual",
        F.round((pe - pa) * F.log(pe / pa), 9).alias("psi_contrib"),
    )


def distribution_drift_fixed(
    df: DataFrame,
    col: str,
    split: Column,
    edges: Sequence[float],
) -> DataFrame:
    """PSI between the split=true (expected) and split=false (actual)
    populations over FIXED bin edges — the materialized-view flavour
    of distribution_drift: the same DDL-time edges a rollup's
    histogram_props declares, so the answer is reproducible across
    deliveries (global-min/max bins shift whenever an outlier lands)
    and foldable from stored bins (psi_from_rollup) without rescanning
    raw events.

    Emits ALL len(edges)+1 bins, empty ones included with a 0.0
    contribution ((pe−pa)·ln(pe/pa) is exactly 0 when both smoothed
    proportions are equal) — bit-identical to the rollup fold, which
    materializes every bin column. One partial-aggregated scan into a
    single row of conditional sums; no window, no second exchange."""
    edges = [float(e) for e in edges]
    if not edges or edges != sorted(set(edges)):
        # overlapping bin conditions from unsorted/duplicate edges
        # count rows in several bins and return a silently wrong PSI
        # — fail loudly for every caller, not just the HTTP route
        raise ValueError(
            f"edges must be strictly increasing, got {edges!r}")
    v = F.col(col)
    # materialize the split as a named boolean so every bin's
    # conditional sum can be ONE parsed SQL expression (guide §7.3:
    # 2×n_bins when/sum py4j trees were the dominant construction
    # cost); expression semantics identical to the former
    # when(cond & sb, 1).otherwise(0) trees.
    pop = df.filter(v.isNotNull() & split.isNotNull()).withColumn(
        "__sb", split.cast("boolean"))
    n_bins = len(edges) + 1
    cs = f"`{col}`"
    aggs = []
    for i in range(n_bins):
        cond = _hist_bin_cond_sql(cs, edges, i)
        aggs.append(F.expr(
            f"CAST(SUM(CASE WHEN {cond} AND __sb THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS __e{i}"))
        aggs.append(F.expr(
            f"CAST(SUM(CASE WHEN {cond} AND NOT __sb THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS __a{i}"))
    return _psi_from_bin_sums(pop.agg(*aggs), n_bins)


def distribution_drift_quantile(
    df: DataFrame,
    col: str,
    split: Column,
    n_bins: int = 10,
    percentile_mode: str = "auto",
) -> DataFrame:
    """PSI over EQUI-DEPTH bins: edges are the BASELINE population's
    own quantiles, so each bin carries ~1/n_bins of the baseline mass
    — the standard production binning for PSI. Equal-width bins
    starve the tails (most mass lands in 2-3 middle bins and small
    shifts vanish into smoothing), and global-min/max bins re-cut
    themselves whenever one outlier lands; baseline quantiles give
    every bin equal statistical weight and move only when the
    BASELINE is re-chosen.

    Plan shape: one exact-percentile aggregate over the baseline rows
    (1 row, broadcast onto the scan — no driver round-trip), bucket =
    1 + Σ(v >= edge_i) as plain boolean sums, one partial-agg
    histogram, PSI over ≤ n_bins rows. Edges are rounded to 9
    decimals on both engines so Spark's percentile and the oracle's
    quantile_cont cannot disagree by a ULP at a bin boundary.
    Duplicate quantiles (heavy point masses) simply skip bins — the
    PSI stays well-defined over the occupied ones.

    ``percentile_mode`` (operators/edges.py — the shared regime
    switch): "auto" keeps the EXACT percentile — the oracle regime —
    while the baseline population is under
    sizing.EXACT_PERCENTILE_MAX_ROWS rows, and swaps in
    percentile_approx beyond it (exact buffers every baseline value
    on one final task); decision counted under
    surface="drift_quantile"."""
    from ._util import track_persist
    from .edges import percentile_edges

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    v = F.col(col)
    pop = df.filter(v.isNotNull() & split.isNotNull())
    sb = split.cast("boolean")
    base = pop.filter(sb)
    if percentile_mode == "auto":
        # feeds the auto-mode count and the edge aggregate
        base = track_persist(base)
    qs = [i / n_bins for i in range(1, n_bins)]
    edges, _mode = percentile_edges(
        base, [(col, qs, "q")], mode=percentile_mode, round_digits=9,
        surface="drift_quantile")
    bucket = F.lit(1)
    for i in range(1, n_bins):
        bucket = bucket + (v >= F.col(f"__q{i - 1}")).cast("int")
    binned = (
        pop.withColumn("__k", F.lit(1))
        .join(F.broadcast(edges), "__k")
        .select(bucket.cast("int").alias("bucket"), sb.alias("__exp"))
    )
    hist = binned.groupBy("bucket").agg(
        F.sum(F.col("__exp").cast("long")).alias("n_expected"),
        F.sum((~F.col("__exp")).cast("long")).alias("n_actual"),
    )
    return _psi_contribs(hist, "bucket", n_bins)


def embedding_centroid_drift(
    emb: DataFrame,
    current: Column,
    vec_col: str = "embedding",
    dim: int = 64,
    by: Optional[str] = None,
) -> DataFrame:
    """Embedding-distribution drift between two snapshots: per group,
    the cosine similarity and L2 distance between the REFERENCE
    centroid (rows where ``current`` is false) and the CURRENT one —
    the cheap first-line detector for "did my encoder / corpus shift"
    (a re-trained encoder rotates the space: cosine drops; a topical
    shift translates it: L2 grows). Complements the scalar PSI
    family with a vector-space lens.

    Determinism (hash-oracle recipe): each component is rounded to 7
    decimals (inside float32's precision) and cast to DECIMAL, so the
    per-dimension sums are exact and order-independent; the centroid
    division, the 64-term dot/norm folds (a FIXED left-to-right
    expression tree, not a float aggregation), and the final round-9
    are identical correctly-rounded double ops on both engines.

    Scale shape: ONE map-side-combinable groupBy over the scan
    computing 2 x dim decimal sums + counts per (group, half) —
    the exchange carries (groups x 2) rows of 64 decimals, nothing
    more; the ref/cur pairing is a broadcast self-join of that tiny
    frame. No explode (explode would shuffle N x dim rows), no UDF.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    # r16 (optimization round): the per-dimension expressions are
    # parsed SQL strings (and the wide renames go through ONE
    # selectExpr call) — the F.col/F.round/F.cast tree for dim = 64
    # cost ~5.5 s of driver py4j round-trips PER CALL, several times
    # the query's actual execute time (guide §7.3). Expression trees
    # are term-for-term identical, so the hash oracle is unchanged.
    keys = ([F.col(by)] if by else []) + [current.alias("__cur")]
    per_half = emb.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.expr(
                f"sum(cast(round(cast(`{vec_col}`[{i}] as double), 7) "
                f"as decimal(28,7))) AS __s{i}"
            )
            for i in range(dim)
        ],
    )
    mean = lambda p, i: (  # noqa: E731
        f"(cast(`{p}__s{i}` as double) / cast(`{p}__n` as double))")
    ref = per_half.filter(~F.col("__cur")).selectExpr(
        *([f"`{by}`"] if by else []),
        "__n AS r__n",
        *[f"__s{i} AS r__s{i}" for i in range(dim)],
    )
    cur = per_half.filter(F.col("__cur")).selectExpr(
        *([f"`{by}` AS __byc"] if by else []),
        "__n AS c__n",
        *[f"__s{i} AS c__s{i}" for i in range(dim)],
    )
    if by:
        joined = ref.join(F.broadcast(cur),
                          F.col(by).eqNullSafe(F.col("__byc"))).drop("__byc")
    else:
        joined = ref.withColumn("__k", F.lit(1)).join(
            F.broadcast(cur.withColumn("__k", F.lit(1))), "__k").drop("__k")

    def _fold(terms):
        # " + " joins parse left-associative — the exact tree the
        # Column `+` fold built
        return "(" + " + ".join(terms) + ")"

    dot = _fold([f"({mean('r', i)} * {mean('c', i)})" for i in range(dim)])
    n_r = _fold([f"({mean('r', i)} * {mean('r', i)})" for i in range(dim)])
    n_c = _fold([f"({mean('c', i)} * {mean('c', i)})" for i in range(dim)])
    l2 = _fold([
        f"(({mean('r', i)} - {mean('c', i)})"
        f" * ({mean('r', i)} - {mean('c', i)}))"
        for i in range(dim)
    ])
    return joined.selectExpr(
        *([f"`{by}`"] if by else []),
        "r__n AS n_ref",
        "c__n AS n_cur",
        f"round({dot} / sqrt({n_r} * {n_c}), 9) AS centroid_cosine",
        f"round(sqrt({l2}), 9) AS centroid_l2",
    )
