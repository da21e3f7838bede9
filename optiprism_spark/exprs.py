"""DSL → PySpark Column expressions.

Re-expresses the reference's expression builders (query/src/expr.rs:
time_expression :38-57, event_expression :60-115,
named_property_expression :299-391) as native Spark Columns so
Catalyst can push them into the parquet scan. No dictionary-key
rewriting is needed (SURVEY §2.2): we keep plain strings and rely on
parquet dictionary encoding + predicate pushdown.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dsl import (
    EventFilterSpec,
    EventRef,
    PropFilter,
    PropKind,
    PropOp,
    PropertyRef,
    QueryTime,
)
from .schema import DTYPE_TO_SPARK, EVENT_NAME_COL, EVENT_TIME_COL


def multi_and(exprs: Sequence[Column]) -> Optional[Column]:
    """reference query/src/logical_plan/expr.rs:1-68 (multi_and)."""
    exprs = [e for e in exprs if e is not None]
    return reduce(lambda a, b: a & b, exprs) if exprs else None


def multi_or(exprs: Sequence[Column]) -> Optional[Column]:
    """None means TRUE (an unrestricted predicate): a None OPERAND
    makes the whole OR true, so the result is None — dropping it, as
    multi_and correctly does for AND, would silently NARROW the match
    (e.g. a custom event with one match-all member). Empty input is
    also None (no restriction)."""
    if any(e is None for e in exprs):
        return None
    return reduce(lambda a, b: a | b, exprs) if exprs else None


def prop_col(prop: PropertyRef) -> Column:
    """Resolve a property reference to a Column.

    JSON properties are extracted from the ``props`` string column and
    cast to the declared DType — the Spark analogue of the reference's
    "every property is a physical column" model for properties that
    were never materialized.
    """
    if prop.kind == PropKind.COLUMN:
        return F.col(prop.name)
    if any(ch in prop.name for ch in ".[]'\""):
        # a flat key literally named "utm.source" would otherwise be
        # read as nested utm->source and extract NULL everywhere;
        # bracket-quote it (JSONPath) so the literal key resolves
        path = "$['" + prop.name.replace("'", "\\'") + "']"
    else:
        path = f"$.{prop.name}"
    c = F.get_json_object(F.col("props"), path)
    dtype = DTYPE_TO_SPARK.get(prop.dtype)
    return c.cast(dtype) if dtype is not None and prop.dtype != "string" else c


def _ts_lit(v) -> Column:
    # Serialize datetime bounds as strings cast in the session timezone
    # (UTC): a naive-datetime F.lit() goes through the *host* timezone
    # during plan serialization, which would shift query ranges on a
    # non-UTC driver host. Timezone-AWARE datetimes are converted to
    # UTC first — strftime would silently drop the offset and shift
    # the bound by it.
    if v.tzinfo is not None:
        import datetime as _dt

        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return F.lit(v.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp")


def time_expression(time: QueryTime, ts_col: str = EVENT_TIME_COL) -> Optional[Column]:
    """ts >= from AND ts <= to (reference query/src/expr.rs:38-57)."""
    start, end = time.range()
    exprs = []
    if start is not None:
        exprs.append(F.col(ts_col) >= _ts_lit(start))
    if end is not None:
        exprs.append(F.col(ts_col) <= _ts_lit(end))
    return multi_and(exprs)


def property_expression(f: PropFilter) -> Column:
    """One property filter; multi-value => OR (reference expr.rs:299-391)."""
    c = prop_col(f.prop)
    op = f.op
    if op in (PropOp.EQ, PropOp.NEQ):
        if len(f.values) == 0:
            raise ValueError(f"{op} needs at least one value")
        e = c.isin(list(f.values)) if len(f.values) > 1 else (c == F.lit(f.values[0]))
        return ~e if op == PropOp.NEQ else e
    if op in (PropOp.GT, PropOp.GTE, PropOp.LT, PropOp.LTE, PropOp.LIKE,
              PropOp.NOT_LIKE, PropOp.REGEX, PropOp.NOT_REGEX) \
            and len(f.values) == 0:
        # uniform with EQ/NEQ: an empty list silently passing all rows
        # (or crashing on ~None for the negated ops) hides a caller bug
        raise ValueError(f"{op} needs at least one value")
    if op in (PropOp.GT, PropOp.GTE, PropOp.LT, PropOp.LTE):
        cmp = {
            PropOp.GT: lambda v: c > F.lit(v),
            PropOp.GTE: lambda v: c >= F.lit(v),
            PropOp.LT: lambda v: c < F.lit(v),
            PropOp.LTE: lambda v: c <= F.lit(v),
        }[op]
        return multi_or([cmp(v) for v in f.values])
    if op == PropOp.LIKE:
        return multi_or([c.like(str(v)) for v in f.values])
    if op == PropOp.NOT_LIKE:
        return ~multi_or([c.like(str(v)) for v in f.values])
    if op == PropOp.REGEX:
        return multi_or([c.rlike(str(v)) for v in f.values])
    if op == PropOp.NOT_REGEX:
        return ~multi_or([c.rlike(str(v)) for v in f.values])
    if op == PropOp.TRUE:
        return c == F.lit(True)
    if op == PropOp.FALSE:
        return c == F.lit(False)
    if op == PropOp.EMPTY:
        return c.isNull()
    if op == PropOp.EXISTS:
        return c.isNotNull()
    raise ValueError(f"unsupported op {op}")


def event_expression(event: EventRef, name_col: str = EVENT_NAME_COL) -> Optional[Column]:
    """event = name; custom events expand to OR of members with their
    filters, recursively (reference query/src/expr.rs:60-115)."""
    if event.custom is not None:
        member_exprs = []
        for member in event.custom:
            e = event_expression(member.event, name_col)
            fs = multi_and([property_expression(f) for f in member.filters])
            member_exprs.append(multi_and([x for x in (e, fs) if x is not None]))
        return multi_or(member_exprs)
    if event.name is None:
        return None  # "all events"
    return F.col(name_col) == F.lit(event.name)


def event_spec_expression(spec: EventFilterSpec, name_col: str = EVENT_NAME_COL) -> Optional[Column]:
    e = event_expression(spec.event, name_col)
    fs = multi_and([property_expression(f) for f in spec.filters])
    return multi_and([x for x in (e, fs) if x is not None])


def full_filter(
    time: Optional[QueryTime] = None,
    event: Optional[EventRef] = None,
    filters: Sequence[PropFilter] = (),
    ts_col: str = EVENT_TIME_COL,
    name_col: str = EVENT_NAME_COL,
) -> Optional[Column]:
    """project ∧ time ∧ event ∧ property filters (reference
    query/src/event_segmentation.rs:735-771)."""
    parts = []
    if time is not None:
        parts.append(time_expression(time, ts_col))
    if event is not None:
        parts.append(event_expression(event, name_col))
    parts.extend(property_expression(f) for f in filters)
    return multi_and(parts)
