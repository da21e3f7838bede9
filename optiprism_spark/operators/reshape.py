"""Result reshaping — merge / pivot / unpivot / top-N series / renames.

Re-expresses the reference's chart-formatting operator chain
(SURVEY §2.8-2.10): MergeNode (logical_plan/merge.rs:21-115),
UnpivotNode (logical_plan/unpivot.rs:22-144), PivotNode
(logical_plan/pivot.rs:20-151), AggregateAndSortColumnsNode
(logical_plan/aggregate_columns.rs:23-120), LimitGroupsNode
(logical_plan/limit_groups.rs:17-104), RenameColumnsNode /
RenameColumnRowsNode / ReorderColumnsNode / AddStringColumnNode.
All are native DataFrame expressions — none needed a custom operator.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_frames(dfs: Sequence[DataFrame], names: Optional[Sequence[str]] = None,
                 name_col: str = "event") -> DataFrame:
    """n-ary UNION by column name with schema merge (missing cols →
    null) + optional discriminator column.

    Reference MergeNode/MergeExec (query/src/logical_plan/merge.rs:21-115).
    """
    if names is not None:
        if len(names) != len(dfs):
            raise ValueError(
                f"merge_frames: {len(dfs)} frames but {len(names)} names — "
                "a zip would silently drop frames"
            )
        dfs = [df.select(F.lit(n).alias(name_col), "*") for df, n in zip(dfs, names)]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def unpivot_metrics(df: DataFrame, id_cols: Sequence[str], value_cols: Sequence[str],
                    name_col: str = "agg_name", value_col: str = "value",
                    decimal_t: str = "decimal(28,6)") -> DataFrame:
    """Melt metric columns into (agg_name, value) rows, values cast to
    a common decimal like the reference's Decimal(28,16)
    (physical_plan/unpivot.rs:71-587; scale-6 rationale at
    operators/aggregates.DECIMAL_T)."""
    casted = df.select(
        *id_cols, *[F.col(c).cast(decimal_t).alias(c) for c in value_cols]
    )
    return casted.unpivot(list(id_cols), list(value_cols), name_col, value_col)


def pivot_buckets(df: DataFrame, dims: Sequence[str], bucket_col: str,
                  buckets: Sequence, value_col: str = "value",
                  fill: float = 0) -> DataFrame:
    """Pivot time buckets into one column per bucket with an explicit
    bucket list (single pass — no extra distinct scan) and null→0 fill,
    matching reference PivotNode (result_cols pre-computed from the
    query time range, common/src/query.rs:464-482).

    r16 (optimization round): expressed as ONE conditional
    aggregation — ``max(value) FILTER (bucket = b)`` per bucket —
    instead of ``.pivot().agg(first)``. Spark plans the latter as TWO
    aggregates with TWO exchanges (first() keyed by dims+bucket, then
    pivotfirst keyed by dims); the conditional form is a single
    partial-aggregated groupBy — one exchange (guide §2.4). `max`
    over the unique (dims, bucket) cell equals `first` (each cell
    holds exactly one row: the input is itself an aggregate) while
    keeping the value's type and staying deterministic even for
    pathological duplicate-cell inputs.

    The per-bucket cells are built as ONE parsed SQL expression each
    (not a tree of F.when/F.col py4j calls): measured on the 31-day
    chart pipeline, driver-side plan construction of the pivot was
    0.4-0.6 s of py4j round-trips — more than the query's actual
    compute — and drops ~6x with JVM-side parsing (guide §7.3:
    planning time is driver-side, single-process work)."""
    cells = [
        F.expr(
            f"max(CASE WHEN `{bucket_col}` = {_sql_lit(b)} "
            f"THEN `{value_col}` END)"
        ).alias(str(b))
        for b in buckets
    ]
    out = df.groupBy(*dims).agg(*cells)
    return out.fillna(fill, subset=[c for c in out.columns if c not in dims])


def _sql_lit(v) -> str:
    """SQL literal for a pivot bucket value (date / timestamp /
    string / number) — JVM-parsed, so bucket lists cost one py4j call
    per cell instead of ~6."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    return repr(v)


def add_average_and_sort(df: DataFrame, metric_cols: Sequence[str],
                         avg_col: str = "Average", sort: bool = True) -> DataFrame:
    """Row-wise mean of the per-bucket metric columns + sort desc —
    reference AggregateAndSortColumnsNode (aggregate_columns.rs:23-120).

    ``sort=False`` skips the global orderBy: the chart pipeline feeds
    this straight into ``limit_groups``, whose groupBy destroys the
    order and re-sorts by the same column anyway — paying a full
    distributed sort here buys nothing there."""
    n = len(metric_cols)
    # exact (decimal/int) row-sum cast to double, then ONE double
    # division — deterministic and oracle-reproducible. Built as a
    # single parsed SQL string: the F.coalesce/+ tree for 31 buckets
    # cost ~0.34 s of driver py4j round-trips per query (guide §7.3).
    s = " + ".join(f"coalesce(`{c}`, 0)" for c in metric_cols)
    avg = F.expr(f"cast(cast(({s}) as double) / {float(n)!r} as double)")
    out = df.withColumn(avg_col, avg)
    return out.orderBy(F.desc(avg_col)) if sort else out


def limit_groups(df: DataFrame, group_cols: Sequence[str], limit: int = 50,
                 order_col: Optional[str] = None,
                 persist: bool = True) -> DataFrame:
    """Keep rows belonging to the first `limit` distinct group tuples
    (top-N chart series) — reference LimitGroupsNode
    (logical_plan/limit_groups.rs:17-104, default 50 series).

    Scale shape: the top group tuples are found with a distributed
    orderBy().limit() (TakeOrdered — per-partition top-N merged on the
    driver, no single-task global window), then broadcast back as a
    null-safe semi-join. A deterministic order column should be
    supplied (e.g. the Average column) — falls back to key order.

    ``persist`` (default) materializes ``df`` once so the top-keys
    derivation AND the semi-join probe read the same small
    post-aggregation frame — without it the whole upstream lineage
    (scan → aggregate → pivot) executes twice, one full extra pass
    over the fact table at 100 TB.

    r16 (optimization round): materialization switched from
    ``persist()`` to an eager ``localCheckpoint()``. The persist
    variant only deduplicated ONE side: Spark's self-join attribute
    deduplication rewrites the broadcast ``top`` subtree's expression
    ids, the CacheManager substitution misses it, and the physical
    plan kept a SECOND full scan→aggregate→pivot chain under the
    BroadcastExchange (see plans/r16/seg_chart_pipeline_before.txt,
    operators (19)-(35) — a duplicate `Scan parquet` where the design
    said cache). The checkpoint cuts the lineage BEFORE the self-join
    is formed, so both branches read the materialized partitions;
    guide §3.3 (materialise an intermediate to truncate the plan).

    r17 decision (verdict item 8): persist-before-self-join was
    RE-TESTED on Spark 4.1 and still leaves one duplicate scan chain
    (the substitution miss stands), so the checkpoint stays. The
    documented trade: checkpoint blocks have no recompute path —
    losing an executor mid-query fails this (interactive, seconds-
    scale) chart query instead of recomputing, and the blocks are
    released by the ContextCleaner when the frame is garbage-
    collected rather than by `unpersist_tracked` (an explicit release
    would need private-API RDD-id bookkeeping that is racy under the
    server's concurrent FAIR scheduling). The frame is
    post-aggregation (series × buckets), orders of magnitude below
    the fact table."""
    if persist:
        df = df.localCheckpoint(eager=True)
    order_val = F.max(order_col).alias("__ord") if order_col else F.lit(0).alias("__ord")
    order = [F.desc("__ord")] if order_col else []
    # the top frame's key columns are renamed (__g_<c>) so the join
    # condition is unambiguous — df[c] vs top[c] would both resolve to
    # the same attribute of this self-derived frame and depend on
    # Spark's dataset-id disambiguation repair
    top = (
        df.groupBy(*group_cols).agg(order_val)
        .orderBy(*order, *[F.col(c) for c in group_cols])
        .limit(limit)
        .select(*[F.col(c).alias(f"__g_{c}") for c in group_cols])
    )
    cond = reduce(
        lambda a, b: a & b,
        [df[c].eqNullSafe(F.col(f"__g_{c}")) for c in group_cols],
    )
    out = df.join(F.broadcast(top), cond, "left_semi")
    # restore the caller-visible row order (the chart contract sorts
    # rows by the Average column; a semi-join does not preserve it)
    if order_col:
        out = out.orderBy(F.desc(order_col), *[F.col(c) for c in group_cols])
    return out


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Reference RenameColumnsNode."""
    return df.withColumnsRenamed(mapping)


def rename_column_rows(df: DataFrame, col: str, mapping: dict) -> DataFrame:
    """Remap values inside one column — reference RenameColumnRowsNode.
    An empty mapping is a no-op (not an AttributeError)."""
    if not mapping:
        return df
    expr = None
    for old, new in mapping.items():
        cond = F.col(col) == F.lit(old)
        expr = F.when(cond, F.lit(new)) if expr is None else expr.when(cond, F.lit(new))
    return df.withColumn(col, expr.otherwise(F.col(col)))


def reorder_columns(df: DataFrame, first: Sequence[str]) -> DataFrame:
    """Put the given columns first — reference ReorderColumnsNode."""
    rest = [c for c in df.columns if c not in first]
    return df.select(*first, *rest)


def add_string_column(df: DataFrame, name: str, value: str) -> DataFrame:
    """Prepend a constant column — reference AddStringColumnNode."""
    return df.select(F.lit(value).alias(name), "*")
