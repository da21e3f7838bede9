"""Query DSL — Python dataclasses mirroring the reference's JSON DSL AST.

Modeled on the reference's request types (common/src/query.rs,
common/src/event_segmentation.rs, common/src/funnel.rs) but detached
from its metadata catalog: properties are referenced by column name
(or a JSON path into the ``props`` column) instead of catalog ids.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from enum import Enum
from typing import Optional, Sequence, Union


# ---------------------------------------------------------------- time

class TimeIntervalUnit(str, Enum):
    """Bucketing/interval units (reference common/src/query.rs:424-462)."""

    SECOND = "second"
    MINUTE = "minute"
    HOUR = "hour"
    DAY = "day"
    WEEK = "week"
    MONTH = "month"
    YEAR = "year"

    def duckdb_part(self) -> str:
        return self.value


@dataclass(frozen=True)
class QueryTime:
    """Time range: Between | From | Last(n, unit).

    Reference common/src/query.rs:401-422.
    """

    kind: str  # "between" | "from" | "last"
    start: Optional[dt.datetime] = None
    end: Optional[dt.datetime] = None
    last: Optional[int] = None
    unit: Optional[TimeIntervalUnit] = None
    now: Optional[dt.datetime] = None  # injected "now" for deterministic Last

    @staticmethod
    def between(start: dt.datetime, end: dt.datetime) -> "QueryTime":
        return QueryTime("between", start=start, end=end)

    @staticmethod
    def from_(start: dt.datetime) -> "QueryTime":
        return QueryTime("from", start=start)

    @staticmethod
    def last(n: int, unit: TimeIntervalUnit, now: dt.datetime) -> "QueryTime":
        return QueryTime("last", last=n, unit=unit, now=now)

    def range(self) -> tuple[Optional[dt.datetime], Optional[dt.datetime]]:
        if self.kind == "between":
            return self.start, self.end
        if self.kind == "from":
            return self.start, None
        # "last": calendar months/years via dateutil-free arithmetic
        assert self.now is not None and self.last is not None and self.unit is not None
        now = self.now
        n = self.last
        if self.unit == TimeIntervalUnit.YEAR:
            # clamp like the MONTH branch: Feb 29 minus N years is
            # otherwise a ValueError on every non-leap target year
            year = now.year - n
            day = min(now.day, _days_in_month(year, now.month))
            start = now.replace(year=year, day=day)
        elif self.unit == TimeIntervalUnit.MONTH:
            month = now.month - n
            year = now.year + (month - 1) // 12
            month = (month - 1) % 12 + 1
            day = min(now.day, _days_in_month(year, month))
            start = now.replace(year=year, month=month, day=day)
        else:
            seconds = {
                TimeIntervalUnit.SECOND: 1,
                TimeIntervalUnit.MINUTE: 60,
                TimeIntervalUnit.HOUR: 3600,
                TimeIntervalUnit.DAY: 86400,
                TimeIntervalUnit.WEEK: 604800,
            }[self.unit]
            start = now - dt.timedelta(seconds=n * seconds)
        return start, now


def _days_in_month(year: int, month: int) -> int:
    if month == 12:
        return 31
    return (dt.date(year, month + 1, 1) - dt.date(year, month, 1)).days


# ---------------------------------------------------------------- properties & filters

class PropKind(str, Enum):
    COLUMN = "column"  # physical column on the table
    JSON = "json"  # key inside the `props` JSON string column


@dataclass(frozen=True)
class PropertyRef:
    name: str
    kind: PropKind = PropKind.COLUMN
    dtype: str = "string"  # DType name, used to cast JSON-extracted values

    @staticmethod
    def column(name: str) -> "PropertyRef":
        return PropertyRef(name, PropKind.COLUMN)

    @staticmethod
    def json(name: str, dtype: str = "string") -> "PropertyRef":
        return PropertyRef(name, PropKind.JSON, dtype)


class PropOp(str, Enum):
    """Property comparison ops (reference common/src/query.rs:235-250)."""

    EQ = "eq"
    NEQ = "neq"
    GT = "gt"
    GTE = "gte"
    LT = "lt"
    LTE = "lte"
    LIKE = "like"
    NOT_LIKE = "not_like"
    REGEX = "regex"
    NOT_REGEX = "not_regex"
    TRUE = "true"
    FALSE = "false"
    EMPTY = "empty"  # IS NULL
    EXISTS = "exists"  # IS NOT NULL


@dataclass(frozen=True)
class PropFilter:
    prop: PropertyRef
    op: PropOp
    values: Sequence = ()  # multi-value => OR (reference query/src/expr.rs:299-391)


@dataclass(frozen=True)
class EventRef:
    """Regular event by name, or custom event = OR of members.

    Reference common/src/query.rs (EventRef) + query/src/expr.rs:60-115.
    """

    name: Optional[str] = None
    custom: Optional[Sequence["EventFilterSpec"]] = None


@dataclass(frozen=True)
class EventFilterSpec:
    event: EventRef
    filters: Sequence[PropFilter] = ()


# ---------------------------------------------------------------- segmentation queries

class AggFn(str, Enum):
    COUNT = "count"
    SUM = "sum"
    MIN = "min"
    MAX = "max"
    AVG = "avg"
    MEDIAN = "median"  # declared-unimplemented in reference; native here
    P25 = "p25"
    P75 = "p75"
    P90 = "p90"
    P99 = "p99"
    DISTINCT_COUNT = "distinct_count"


@dataclass(frozen=True)
class SegQuery:
    """One metric of an event-segmentation request.

    Mirrors reference common/src/event_segmentation.rs:57-77 Query enum:
    count_events | count_unique_groups | daily_active_groups |
    weekly_active_groups | monthly_active_groups | count_per_group |
    aggregate_property | aggregate_property_per_group | formula.
    """

    kind: str
    agg: Optional[AggFn] = None  # outer aggregate
    inner_agg: Optional[AggFn] = None  # per-group inner aggregate
    prop: Optional[PropertyRef] = None
    formula: Optional[str] = None
    alias: Optional[str] = None
    #: count_unique_groups only: opt in to a sketch-backed estimate so
    #: the metric can be answered from a rollup's HLL column (± ~1% at
    #: high cardinality, exact in the sketch's sparse regime). Without
    #: a rollup attached the raw path still computes the exact
    #: distinct — approx widens ROUTABILITY, it never degrades a scan.
    approx: bool = False


@dataclass(frozen=True)
class EventQuery:
    event: EventRef
    queries: Sequence[SegQuery]
    filters: Sequence[PropFilter] = ()
    breakdowns: Sequence[PropertyRef] = ()


class Analysis(str, Enum):
    """Chart analysis (reference common/src/event_segmentation.rs:24-42 —
    declared there, engine-side unimplemented; implemented here via
    window functions)."""

    LINEAR = "linear"
    ROLLING_AVERAGE = "rolling_average"
    CUMULATIVE = "cumulative"
    LOGARITHMIC = "logarithmic"


@dataclass(frozen=True)
class Compare:
    offset: int
    unit: TimeIntervalUnit


@dataclass(frozen=True)
class EventSegmentationRequest:
    time: QueryTime
    interval: TimeIntervalUnit
    events: Sequence[EventQuery]
    group_col: str = "user_id"
    filters: Sequence[PropFilter] = ()
    breakdowns: Sequence[PropertyRef] = ()
    segments: Sequence["Segment"] = ()
    analysis: Analysis = Analysis.LINEAR
    rolling_window: int = 7
    compare: Optional[Compare] = None


# ---------------------------------------------------------------- segments

class SegmentTimeKind(str, Enum):
    BETWEEN = "between"
    FROM = "from"
    LAST = "last"
    AFTER_FIRST_USE = "after_first_use"
    WINDOW_EACH = "each"


@dataclass(frozen=True)
class SegmentCondition:
    """has_property_value | had_property_value | did_event |
    did_event_relative_count | did_event_historical_count (reference
    common/src/query.rs:313-399; RelativeCount/HistoricalCount are
    `unimplemented!` in the reference engine,
    query/src/event_segmentation.rs:456-545 — implemented here).

    - relative count: the user's count of ``event`` is compared to
      their count of ``relative_event`` instead of a literal.
    - historical count: the count runs over the user's FULL history —
      any ``time`` on the condition is deliberately ignored.
    """

    kind: str
    prop: Optional[PropertyRef] = None
    op: Optional[PropOp] = None
    values: Sequence = ()
    event: Optional[EventRef] = None
    filters: Sequence[PropFilter] = ()
    agg: Optional[AggFn] = None  # did_event aggregate-property
    agg_prop: Optional[PropertyRef] = None
    compare_op: PropOp = PropOp.GTE
    right: float = 1.0
    time: Optional[QueryTime] = None
    relative_event: Optional[EventRef] = None  # did_event_relative_count
    relative_filters: Sequence[PropFilter] = ()


@dataclass(frozen=True)
class Segment:
    name: str
    #: OR of ANDs (reference: Segment{conditions: Or<And<SegmentCondition>>})
    conditions: Sequence[Sequence[SegmentCondition]] = ()


# ---------------------------------------------------------------- funnel

class StepOrder(str, Enum):
    EXACT = "exact"
    ANY = "any"


class FunnelCountMode(str, Enum):
    UNIQUE = "unique"
    NON_UNIQUE = "non_unique"
    SESSION = "session"  # unimplemented in reference; sessionized here


class FunnelTouch(str, Enum):
    FIRST = "first"
    LAST = "last"
    STEP = "step"


@dataclass(frozen=True)
class FunnelStep:
    events: Sequence[EventFilterSpec]
    order: StepOrder = StepOrder.EXACT
    #: for Any order: step-index ranges whose events may satisfy this
    #: step (reference StepOrder::Any(Vec<(usize,usize)>))
    any_ranges: Sequence[tuple[int, int]] = ()


@dataclass(frozen=True)
class FunnelExclude:
    event: EventFilterSpec
    between_steps: Optional[tuple[int, int]] = None  # None = anywhere


@dataclass(frozen=True)
class FunnelFilter:
    """drop_off_on_any_step | drop_off_on_step(n) | time_to_convert(min,max ms)."""

    kind: str
    step: Optional[int] = None
    min_ms: Optional[int] = None
    max_ms: Optional[int] = None


@dataclass(frozen=True)
class FunnelRequest:
    time: QueryTime
    interval: TimeIntervalUnit
    steps: Sequence[FunnelStep]
    window_ms: int
    group_col: str = "user_id"
    count_mode: FunnelCountMode = FunnelCountMode.UNIQUE
    excludes: Sequence[FunnelExclude] = ()
    constants: Sequence[PropertyRef] = ()
    filter: Optional[FunnelFilter] = None
    touch: FunnelTouch = FunnelTouch.FIRST
    touch_step: int = 0
    breakdowns: Sequence[PropertyRef] = ()
    filters: Sequence[PropFilter] = ()
    segments: Sequence[Segment] = ()
