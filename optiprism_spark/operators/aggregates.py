"""Event-segmentation aggregates — the heart of the engine.

Re-expresses the reference's custom streaming aggregate operators
(query/src/physical_plan/expressions/aggregate/: Count count.rs:48-372,
Aggregate mod.rs:131-626, PartitionedCount partitioned/count.rs:59-571,
PartitionedAggregate partitioned/aggregate.rs:83-1126, and the
partial/final SegmentedAggregate execs) as plain declarative Spark
aggregations. The reference needed ~3k lines of custom Rust because
DataFusion lacked two-level per-user aggregation over its sorted
storage; in Spark both levels are native ``groupBy`` — Catalyst gives
partial/final (map-side combine) aggregation, spilling, and codegen
for free, so no custom operator is required.

Scale notes (100 TB):
- Single-level aggs are one shuffle on the (bucket, breakdown) keys
  with map-side partial aggregation — the ideal shape.
- Two-level per-user aggs shuffle on (user, keys) then on (keys); the
  first shuffle dominates. If the events table is bucketed/sorted by
  ``user_id`` at write time, Catalyst elides the first shuffle.
- Distinct-user counts use ``countDistinct`` (exact, 2-phase); at
  extreme cardinality callers can pass approx=True to get HLL
  (``approx_count_distinct``) which is one pass, no expansion.

Aggregate kinds map to the reference DSL (common/src/event_segmentation.rs:57-77):
count_events, count_unique_groups, daily/weekly/monthly_active_groups,
count_per_group{agg}, aggregate_property{agg},
aggregate_property_per_group{inner, outer}. Median / percentiles /
distinct-count are declared-but-unimplemented in the reference
(common/src/query.rs:41-47); Spark has them natively so they are
implemented here.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dsl import (
    AggFn,
    EventQuery,
    EventSegmentationRequest,
    SegQuery,
    TimeIntervalUnit,
)
from ..exprs import full_filter, prop_col
from ..schema import EVENT_TIME_COL

#: numeric aggregation is performed on fixed-point decimal, echoing the
#: reference's Decimal(28,16) arithmetic (common/src/types.rs:14-16) and —
#: crucially — making SUM/AVG deterministic (exact) regardless of
#: partitioning/summation order, so results are reproducible at any
#: cluster size and hash-match a SQL oracle. Scale is 6, not 16: Spark
#: casts double→decimal by rounding the exact binary expansion while
#: DuckDB rounds the shortest decimal representation — they agree only
#: when the scale is comfortably above the data's decimal scale and
#: below the fp-residue digits (~17).
DECIMAL_T = "decimal(28,6)"

BUCKET_COL = "bucket"
_DATE_UNITS = {
    TimeIntervalUnit.DAY,
    TimeIntervalUnit.WEEK,
    TimeIntervalUnit.MONTH,
    TimeIntervalUnit.YEAR,
}


def bucket_col(
    interval: TimeIntervalUnit, ts_col: str = EVENT_TIME_COL, as_date: bool = True
) -> Column:
    """date_trunc group key (reference query/src/event_segmentation.rs:784-798).

    Day-and-coarser buckets are cast to DateType (cleaner output, and a
    partition-pruning-friendly key when the table is date-partitioned).
    """
    c = F.date_trunc(interval.value, F.col(ts_col))
    if as_date and interval in _DATE_UNITS:
        c = c.cast("date")
    return c


def _exact_numeric(c: Column) -> Column:
    return c.cast(DECIMAL_T)


def agg_expr(agg: AggFn, c: Column, approx_distinct: bool = False) -> Column:
    """Map an AggFn to a Spark aggregate expression.

    SUM/AVG run on Decimal(28,16) and surface as double (see DECIMAL_T).
    """
    if agg == AggFn.COUNT:
        return F.count(c)
    if agg == AggFn.SUM:
        return F.sum(_exact_numeric(c)).cast("double")
    if agg == AggFn.MIN:
        return F.min(c)
    if agg == AggFn.MAX:
        return F.max(c)
    if agg == AggFn.AVG:
        # exact decimal sum / count → one double division: deterministic
        return (F.sum(_exact_numeric(c)).cast("double") / F.count(c)).cast("double")
    if agg == AggFn.MEDIAN:
        return F.percentile(c, F.lit(0.5))
    if agg in (AggFn.P25, AggFn.P75, AggFn.P90, AggFn.P99):
        q = {AggFn.P25: 0.25, AggFn.P75: 0.75, AggFn.P90: 0.90, AggFn.P99: 0.99}[agg]
        return F.percentile(c, F.lit(q))
    if agg == AggFn.DISTINCT_COUNT:
        return F.approx_count_distinct(c) if approx_distinct else F.count_distinct(c)
    raise ValueError(f"unsupported aggregate {agg}")


def _query_alias(ei: int, qi: int, q: SegQuery) -> str:
    """Reference column-naming protocol `{event_idx}_{query_idx}_{name}`
    (query/src/event_segmentation.rs:633-651)."""
    if q.alias:
        return q.alias
    name = q.kind if q.agg is None else f"{q.kind}_{q.agg.value}"
    return f"{ei}_{qi}_{name}"


def _active_bucket(kind: str, ts_col: str) -> Optional[Column]:
    if kind == "daily_active_groups":
        return bucket_col(TimeIntervalUnit.DAY, ts_col)
    if kind == "weekly_active_groups":
        return bucket_col(TimeIntervalUnit.WEEK, ts_col)
    if kind == "monthly_active_groups":
        return bucket_col(TimeIntervalUnit.MONTH, ts_col)
    return None


def event_segmentation_one(
    events: DataFrame,
    req: EventSegmentationRequest,
    eq: EventQuery,
    event_idx: int = 0,
    segment_users: Optional[DataFrame] = None,
    segment_name: Optional[str] = None,
) -> DataFrame:
    """One event's metrics, long format: (bucket, *breakdowns, metric...).

    Plan shape: scan → filter (pushed down) → [segment left-semi join]
    → single-level groupBy ⨝ two-level groupBy — at most 2 shuffles,
    joined on the group keys (broadcast-sized after aggregation).
    """
    cond = full_filter(req.time, eq.event, list(req.filters) + list(eq.filters))
    df = events.filter(cond) if cond is not None else events
    if segment_users is not None:
        # reference SegmentExec semi-join semantics (SURVEY §2.3)
        df = df.join(segment_users.hint("broadcast"), req.group_col, "left_semi")

    breakdowns = list(req.breakdowns) + list(eq.breakdowns)
    bd_names = [b.name for b in breakdowns]
    keys = [bucket_col(req.interval).alias(BUCKET_COL)] + [
        prop_col(b).alias(b.name) for b in breakdowns
    ]
    key_names = [BUCKET_COL] + bd_names
    group = F.col(req.group_col)

    simple_aggs: list[Column] = []
    two_level: list[tuple[str, SegQuery]] = []
    formulas: list[tuple[str, str]] = []
    for qi, q in enumerate(eq.queries):
        alias = _query_alias(event_idx, qi, q)
        if q.kind == "formula":
            # reference QueryFormula: declared in the DSL
            # (common/src/event_segmentation.rs:74-76) but
            # `unimplemented!` engine-side (event_segmentation.rs:922).
            # Here: an arbitrary SQL expression over the sibling metric
            # aliases, evaluated as a post-aggregation projection.
            formulas.append((alias, q.formula))
        elif q.kind == "count_events":
            simple_aggs.append(F.count(F.lit(1)).alias(alias))
        elif q.kind == "count_unique_groups":
            simple_aggs.append(F.count_distinct(group).alias(alias))
        elif q.kind in ("daily_active_groups", "weekly_active_groups", "monthly_active_groups"):
            # distinct (group, activity-bucket) pairs per chart bucket;
            # with interval == activity unit this is plain DAU/WAU/MAU.
            ab = _active_bucket(q.kind, EVENT_TIME_COL)
            simple_aggs.append(F.count_distinct(group, ab).alias(alias))
        elif q.kind == "aggregate_property":
            simple_aggs.append(agg_expr(q.agg, prop_col(q.prop)).alias(alias))
        elif q.kind in ("count_per_group", "aggregate_property_per_group"):
            two_level.append((alias, q))
        else:
            raise ValueError(f"unsupported query kind {q.kind}")

    if formulas and not (simple_aggs or two_level):
        raise ValueError(
            "a formula query needs sibling metric queries to reference"
        )
    if not (simple_aggs or two_level):
        raise ValueError("event query needs at least one metric query")
    parts: list[DataFrame] = []
    if simple_aggs:
        parts.append(df.groupBy(*keys).agg(*simple_aggs))
    if two_level:
        inner_aggs = []
        for alias, q in two_level:
            if q.kind == "count_per_group":
                inner_aggs.append(F.count(F.lit(1)).alias(f"__inner_{alias}"))
            else:
                inner_aggs.append(agg_expr(q.inner_agg, prop_col(q.prop)).alias(f"__inner_{alias}"))
        per_user = df.groupBy(*(keys + [group.alias("__g")])).agg(*inner_aggs)
        outer_aggs = [
            agg_expr(q.agg, F.col(f"__inner_{alias}")).alias(alias) for alias, q in two_level
        ]
        parts.append(per_user.groupBy(*key_names).agg(*outer_aggs))

    out = parts[0]
    for p in parts[1:]:
        if not key_names:
            out = out.join(p, key_names, "full_outer")
        else:
            # NULL-SAFE key equality: a NULL breakdown value (missing
            # JSON key) is one group on both sides; a plain equi-join
            # (NULL != NULL) would split it into two half-empty rows
            # and NULL out any formula spanning both parts
            cond = None
            for kn in key_names:
                c = out[kn].eqNullSafe(p[kn])
                cond = c if cond is None else cond & c
            joined = out.join(p, cond, "full_outer")
            out = joined.select(
                *[F.coalesce(out[kn], p[kn]).alias(kn) for kn in key_names],
                *[out[c] for c in out.columns if c not in key_names],
                *[p[c] for c in p.columns if c not in key_names],
            )
    for alias, formula in formulas:
        out = out.withColumn(alias, F.expr(formula))
    if segment_name is not None:
        out = out.select(F.lit(segment_name).alias("segment"), "*")
    return out
