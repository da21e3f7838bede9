"""Event-segmentation query lifecycle — the chart-ready pipeline.

Reproduces the reference's logical-plan chain (SURVEY §3.1 step 4,
query/src/event_segmentation.rs:245-454):

    scan → filter → [segment semi-join] → partitioned aggregate
    → [unpivot → pivot(bucket columns) → rename] → average+sort
    → limit top-N series → merge events (+`event` column)

Two output formats, as in the reference (`Format::Regular` vs
`Format::Compact`, query/src/context.rs:4-9):

- ``compact``: long format — one row per (bucket, breakdowns),
  metric columns as-is. This is the analytics-friendly shape and the
  one the differential oracle checks.
- ``regular``: chart format — one row per (event, breakdowns, metric),
  one column per time bucket, plus an ``Average`` column, rows sorted
  by it, capped at the top 50 series (reference LimitGroups default).
"""

from __future__ import annotations

import datetime as dt
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dsl import Analysis, EventSegmentationRequest, TimeIntervalUnit
from ..operators.aggregates import BUCKET_COL, _query_alias, event_segmentation_one
from ..operators.reshape import (
    add_average_and_sort,
    limit_groups,
    merge_frames,
    pivot_buckets,
    unpivot_metrics,
)
from ..operators.windows import compare_previous, cumulative, logarithmic, rolling_average
from ..rollup import RollupSpec, event_segmentation_from_rollup, rollup_supports

SERIES_LIMIT = 50  # reference event_segmentation.rs:723-730


def expected_buckets(req: EventSegmentationRequest) -> list:
    """Pre-compute the pivot's bucket list from the query time range
    (reference common/src/query.rs:464-482 result_cols) — avoids a
    second pass over the data to discover distinct buckets."""
    start, end = req.time.range()
    if start is None or end is None:
        raise ValueError("regular format needs a bounded time range")
    unit = req.interval
    out = []
    cur = _truncate(start, unit)
    while cur <= end:
        out.append(cur.date() if unit in (TimeIntervalUnit.DAY, TimeIntervalUnit.WEEK,
                                          TimeIntervalUnit.MONTH, TimeIntervalUnit.YEAR) else cur)
        cur = _advance(cur, unit)
    return out


def _truncate(ts: dt.datetime, unit: TimeIntervalUnit) -> dt.datetime:
    if unit == TimeIntervalUnit.WEEK:  # ISO Monday start (reference common/src/query.rs:496-501)
        d = ts.date() - dt.timedelta(days=ts.weekday())
        return dt.datetime(d.year, d.month, d.day)
    parts = dict(second=ts.replace(microsecond=0),
                 minute=ts.replace(second=0, microsecond=0),
                 hour=ts.replace(minute=0, second=0, microsecond=0),
                 day=ts.replace(hour=0, minute=0, second=0, microsecond=0),
                 month=ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0),
                 year=ts.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0))
    return parts[unit.value]


def _advance(ts: dt.datetime, unit: TimeIntervalUnit) -> dt.datetime:
    if unit == TimeIntervalUnit.MONTH:
        y, m = (ts.year + 1, 1) if ts.month == 12 else (ts.year, ts.month + 1)
        return ts.replace(year=y, month=m)
    if unit == TimeIntervalUnit.YEAR:
        return ts.replace(year=ts.year + 1)
    step = dict(second=1, minute=60, hour=3600, day=86400, week=604800)[unit.value]
    return ts + dt.timedelta(seconds=step)


def run_event_segmentation(
    events: DataFrame,
    req: EventSegmentationRequest,
    fmt: str = "compact",
    series_limit: int = SERIES_LIMIT,
    segment_users: Optional[dict[str, DataFrame]] = None,
    rollup: Optional[tuple[DataFrame, "RollupSpec"]] = None,
) -> DataFrame:
    """Execute a full event-segmentation request.

    ``segment_users``: optional {segment_name: DataFrame[group_col]}
    produced by operators.segments; each segment yields its own copy
    of every series (reference SegmentedAggregate one-output-per-
    segment, SURVEY §2.4).

    ``rollup``: optional (rollup_df, RollupSpec) pre-aggregate — or a
    list of them, tried in order (first whose spec supports the
    event-query wins; see rollup.py). Each rollup-expressible
    event-query is answered from the pre-aggregate — a scan orders of
    magnitude smaller than raw events — with bit-identical results;
    the rest fall back to the raw scan, per event-query.
    """
    rollups = (
        [] if rollup is None
        else [rollup] if isinstance(rollup, tuple)
        else list(rollup)
    )
    if segment_users is None and req.segments:
        # the request's own segments (reference DSL body "segments"):
        # compute each cohort's user set once; every (event, segment)
        # pair yields its own series copy
        from ..operators.segments import segment_users as _seg_users

        segment_users = {
            s.name: _seg_users(events, s, req.group_col)
            for s in req.segments
        }
    per_event: list[DataFrame] = []
    names: list[str] = []  # one entry per appended frame (event × segment)
    for ei, eq in enumerate(req.events):
        ev_name = eq.event.name or f"event_{ei}"
        segs = segment_users.items() if segment_users else [(None, None)]
        for seg_name, seg_df in segs:
            hit = None
            if seg_df is None:
                hit = next(
                    (r for r in rollups if rollup_supports(req, eq, r[1])), None
                )
            if rollups:
                from .. import metrics

                metrics.query_rollup_routed_total().inc(
                    path="rollup" if hit is not None else "raw")
            if hit is not None:
                long_df = event_segmentation_from_rollup(
                    hit[0], req, eq, event_idx=ei, spec=hit[1]
                )
            else:
                long_df = event_segmentation_one(
                    events, req, eq, event_idx=ei, segment_users=seg_df, segment_name=seg_name
                )
            # analysis/compare apply to BOTH output formats — the
            # chart format previously skipped them silently
            long_df = _apply_analysis(long_df, req, ei, eq, seg_name)
            if fmt == "compact":
                per_event.append(long_df)
            else:
                per_event.append(_to_chart(long_df, req, ei, eq, series_limit))
            names.append(ev_name)

    if len(per_event) == 1:
        return per_event[0]
    return merge_frames(per_event, names=names if len(req.events) > 1 else None)


def _apply_analysis(long_df: DataFrame, req: EventSegmentationRequest, ei, eq, seg_name) -> DataFrame:
    """Rolling-average / cumulative / period-compare over the metric
    columns (reference Analysis + Compare DSL, engine-side
    unimplemented there — SURVEY §2.7)."""
    if req.analysis == Analysis.LINEAR and req.compare is None:
        return long_df
    metric_aliases = [_query_alias(ei, qi, q) for qi, q in enumerate(eq.queries)]
    parts = [c for c in long_df.columns if c != BUCKET_COL and c not in metric_aliases]
    out = long_df
    if req.analysis == Analysis.ROLLING_AVERAGE:
        out = rolling_average(out, metric_aliases, partition_cols=parts,
                              window=req.rolling_window,
                              interval=req.interval.value)
    elif req.analysis == Analysis.CUMULATIVE:
        out = cumulative(out, metric_aliases, partition_cols=parts)
    elif req.analysis == Analysis.LOGARITHMIC:
        out = logarithmic(out, metric_aliases)
    if req.compare is not None:
        out = compare_previous(out, metric_aliases, offset=req.compare.offset,
                               partition_cols=parts,
                               unit=req.compare.unit.value,
                               interval=req.interval.value)
    return out


def _to_chart(long_df: DataFrame, req: EventSegmentationRequest, ei, eq, series_limit: int) -> DataFrame:
    metric_aliases = [_query_alias(ei, qi, q) for qi, q in enumerate(eq.queries)]
    # compare_previous appends derived metric columns; they melt as
    # their own series, never as dimensions
    metric_aliases += [
        c for c in long_df.columns
        if c.endswith("_prev") or c.endswith("_change_pct")
    ]
    dims = [c for c in long_df.columns if c != BUCKET_COL and c not in metric_aliases]
    melted = unpivot_metrics(long_df, [BUCKET_COL] + dims, metric_aliases)
    buckets = expected_buckets(req)
    wide = pivot_buckets(melted, dims + ["agg_name"], BUCKET_COL, buckets)
    bucket_cols = [c for c in wide.columns if c not in dims and c != "agg_name"]
    # sort=False: limit_groups re-sorts by Average after its own
    # groupBy — a global sort here would be paid and then discarded
    wide = add_average_and_sort(wide, bucket_cols, sort=False)
    return limit_groups(wide, dims + ["agg_name"], series_limit, order_col="Average")
