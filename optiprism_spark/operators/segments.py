"""Behavioral segments (cohorts) — SURVEY §2.6.

Re-expresses the reference's segment machinery (logical
SegmentNode/SegmentExpr query/src/logical_plan/segment.rs:23-180,
physical SegmentExec query/src/physical_plan/segment.rs:39-143 and the
per-user segmentation expressions count.rs/aggregate.rs) as plain
DataFrame aggregation + set algebra:

    condition  = filter(time ∧ event ∧ filters)
                 → groupBy(user).agg(count | sum/min/max/avg(prop))
                 → filter(agg <op> literal) → user set
    AND        = inner join of user sets
    OR         = unionByName + distinct
    apply      = left-semi join against the event stream

The reference leaves ``HasPropertyValue`` and relative/historical
counts unimplemented (query/src/event_segmentation.rs:456-545);
``has_property_value`` is implemented here (trivial in Spark).

Scale: each condition is one shuffle on user_id with map-side partial
aggregation; the resulting user sets are orders of magnitude smaller
than the stream and broadcast into the final semi-join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dsl import PropOp, Segment, SegmentCondition
from ..exprs import full_filter, prop_col, property_expression
from ..operators.aggregates import agg_expr
from ..schema import EVENT_USER_COL


def _zero_count_qualifies(op: PropOp, right) -> bool:
    """Does a user with zero matching events satisfy `0 <op> right`?"""
    return {
        PropOp.EQ: 0 == right, PropOp.NEQ: 0 != right,
        PropOp.GT: 0 > right, PropOp.GTE: 0 >= right,
        PropOp.LT: 0 < right, PropOp.LTE: 0 <= right,
    }[op]


def _cmp(col, op: PropOp, right):
    r = right if isinstance(right, Column) else F.lit(right)
    return {
        PropOp.EQ: col == r,
        PropOp.NEQ: col != r,
        PropOp.GT: col > r,
        PropOp.GTE: col >= r,
        PropOp.LT: col < r,
        PropOp.LTE: col <= r,
    }[op]


def _user_universe(events: DataFrame, group_col: str) -> DataFrame:
    """Every user in the scanned stream — the base for conditions
    where absent-from-filter users still qualify (count 0). A full
    distinct scan of the events table: only build it when zero really
    qualifies."""
    return events.select(F.col(group_col).alias(group_col)).distinct()


def condition_users(events: DataFrame, cond: SegmentCondition,
                    group_col: str = EVENT_USER_COL) -> DataFrame:
    """One condition → 1-column DataFrame of qualifying user ids (the
    Spark analogue of SegmentExec's `partition` output column)."""
    user = F.col(group_col)

    if cond.kind in ("has_property_value", "had_property_value"):
        flt = full_filter(cond.time, None, ())
        df = events.filter(flt) if flt is not None else events
        from ..dsl import PropFilter

        df = df.filter(property_expression(PropFilter(cond.prop, cond.op, cond.values)))
        return df.select(user.alias(group_col)).distinct()

    if cond.kind == "did_event_relative_count":
        # count(event) <op> count(relative_event) per user (reference
        # DidEventAggregate::RelativeCount, common/src/query.rs:350-355
        # — unimplemented! there): two filtered counts joined on the
        # user universe with 0-coalescing, so users missing from either
        # side still compare correctly
        def _count(ev, fs):
            flt = full_filter(cond.time, ev, fs)
            df = events.filter(flt) if flt is not None else events
            return df.groupBy(user.alias(group_col)).agg(F.count(F.lit(1)).alias("__c"))

        left = _count(cond.event, cond.filters).withColumnRenamed("__c", "__l")
        right = _count(cond.relative_event, cond.relative_filters) \
            .withColumnRenamed("__c", "__r")
        # 0-vs-0 users appear on NEITHER count side; they only matter
        # when 0 <op> 0 qualifies (EQ/GTE/LTE). Otherwise a full_outer
        # of the two (already tiny) count frames covers every user that
        # can qualify — skipping a whole distinct scan of the events
        # table per condition.
        if cond.compare_op in (PropOp.EQ, PropOp.GTE, PropOp.LTE):
            both = (
                _user_universe(events, group_col)
                .join(left, group_col, "left")
                .join(right, group_col, "left")
            )
        else:
            both = left.join(right, [group_col], "full_outer")
        both = both.select(
            group_col,
            F.coalesce(F.col("__l"), F.lit(0)).alias("__l"),
            F.coalesce(F.col("__r"), F.lit(0)).alias("__r"),
        )
        return both.filter(_cmp(F.col("__l"), cond.compare_op, F.col("__r"))).select(group_col)

    if cond.kind in ("did_event", "did_event_historical_count"):
        # historical count runs over the full history: the reference's
        # HistoricalCount (common/src/query.rs:365-369, unimplemented!
        # there) is a Count whose time range is unbounded
        time = None if cond.kind == "did_event_historical_count" else cond.time
        flt = full_filter(time, cond.event, cond.filters)
        df = events.filter(flt) if flt is not None else events
        if cond.agg is None:  # count condition
            agg = F.count(F.lit(1))
        else:  # aggregate-property condition
            agg = agg_expr(cond.agg, prop_col(cond.agg_prop))
        per_user = df.groupBy(user.alias(group_col)).agg(agg.alias("__v"))
        if cond.agg is None and _zero_count_qualifies(cond.compare_op, cond.right):
            # "did fewer than N times" / "never did": users with NO
            # matching events have count 0 and belong in the cohort, but
            # the filtered aggregation never sees them — join the count
            # onto the full user universe and coalesce to 0 (the
            # reference's per-user streaming exprs walk every user in
            # the scanned stream, count.rs:29-212)
            per_user = _user_universe(events, group_col) \
                .join(per_user, group_col, "left").select(
                group_col, F.coalesce(F.col("__v"), F.lit(0)).alias("__v")
            )
        return per_user.filter(_cmp(F.col("__v"), cond.compare_op, cond.right)).select(group_col)

    raise ValueError(f"unsupported segment condition {cond.kind}")


def segment_users(events: DataFrame, segment: Segment,
                  group_col: str = EVENT_USER_COL) -> DataFrame:
    """Or<And<condition>> composition → user set."""
    if not segment.conditions:
        raise ValueError("segment needs at least one condition group")
    ors = []
    for and_group in segment.conditions:
        if not and_group:
            raise ValueError("segment AND group needs at least one condition")
        sets = [condition_users(events, c, group_col) for c in and_group]
        ors.append(reduce(lambda a, b: a.join(b, group_col, "inner"), sets))
    return reduce(lambda a, b: a.unionByName(b), ors).distinct()


def apply_segment(events: DataFrame, users: DataFrame,
                  group_col: str = EVENT_USER_COL) -> DataFrame:
    """Semi-join the stream against a segment's user set (reference
    partition_exist check, funnel.rs:516-520)."""
    return events.join(users.hint("broadcast"), group_col, "left_semi")
