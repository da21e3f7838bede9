"""Event path / user-journey analysis — beyond the reference.

The reference ships funnels (fixed, ordered step lists) but no
open-ended path exploration (no path/journey types anywhere in
common/src/query.rs or query/src/), yet "what do users do after X" /
"how do users arrive at Y" is the standard companion to funnels in
every product-analytics surface. Built Spark-first:

- anchor: every occurrence of the anchor event inside the query
  window starts (forward) or ends (backward) a path;
- sequence: the next/previous ``steps-1`` events of the SAME user in
  deterministic (ts, event_id) order, optionally bounded by a
  ``within`` wall-clock budget measured from the anchor — because ts
  is monotone along the sequence, an out-of-budget step truncates the
  path at a prefix, never punches a hole in the middle;
- noise control: ``exclude_events`` drops event types from the stream
  BEFORE sequencing (an excluded event neither starts a path nor
  occupies a step — the classic "ignore heartbeats" knob);
- output: either top-k full paths (``event_paths``: path string,
  anchor occurrences, distinct users) or the per-step event
  distribution (``path_dropoff``: step index × next event → counts),
  the sankey-diagram feed.

Plan shape (the 100 TB story): one window over (user, ts, event_id)
— the SAME user-hash partitioning as the funnel kernel, so on the
bucketed events table the sort needs no Exchange; ``lead``/``lag``
are JVM window expressions (no Python); the path aggregation is a
map-side-combinable groupBy on a low-cardinality path string; top-k
is TakeOrdered (no global sort). Nothing leaves whole-stage codegen.
"""

from __future__ import annotations

import datetime as dt
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..dsl import EventRef, PropFilter, QueryTime
from ..exprs import event_expression, full_filter
from ..schema import EVENT_ID_COL, EVENT_NAME_COL, EVENT_TIME_COL, EVENT_USER_COL

#: separator in rendered path strings (picked to be unambiguous for
#: the synthetic event vocabularies; real deployments can re-render
#: from the step arrays if an event name ever contains it)
SEP = " -> "

_MAX_STEPS = 10


def _sequence_frame(
    events: DataFrame,
    anchor: EventRef,
    time: QueryTime,
    steps: int,
    direction: str,
    within: Optional[dt.timedelta],
    filters: Sequence[PropFilter],
    exclude_events: Sequence[str],
    group_col: str,
    name_col: str,
    max_rows_per_user: Optional[int],
) -> tuple[DataFrame, list[Column]]:
    """Anchor rows + their ``steps-1`` conditional neighbour events.

    Returns (frame filtered to anchors, [step-1 .. step-(steps-1)
    event columns]) where a step column is NULL once the user's
    stream ends or the ``within`` budget is exceeded.
    """
    if not 2 <= steps <= _MAX_STEPS:
        raise ValueError(f"steps must be in [2, {_MAX_STEPS}], got {steps}")
    if direction not in ("forward", "backward"):
        raise ValueError(f"direction must be forward|backward, got {direction!r}")

    base_cond = full_filter(time, None, filters)
    df = events.filter(base_cond) if base_cond is not None else events
    if exclude_events:
        df = df.filter(~F.col(name_col).isin(list(exclude_events)))
    # the anchor predicate is evaluated BEFORE the narrow projection:
    # a custom anchor's member filters may reference columns (JSON
    # props) the sequence frame does not carry — the boolean rides
    # through the window instead, and Catalyst still prunes the scan
    # to the referenced columns only
    anchor_cond = event_expression(anchor, name_col)
    df = df.withColumn(
        "__anchor",
        anchor_cond if anchor_cond is not None else F.lit(True))
    df = df.select(group_col, EVENT_TIME_COL, EVENT_ID_COL, name_col,
                   "__anchor")
    w = Window.partitionBy(group_col).orderBy(EVENT_TIME_COL, EVENT_ID_COL)
    if max_rows_per_user is not None:
        # whale guard (OFF by default, lossy for over-cap users —
        # funnel's max_rows_per_user contract): keep each user's
        # chronologically-first cap rows, truncating the whale's path
        # material (anchors past the cutoff drop; the last kept
        # anchor's steps may truncate where uncapped they would
        # continue). Unlike attribution's cutoff-join guard
        # (operators/whale.py — right for a frame that is NOT
        # otherwise window-sorted), paths already sorts every user's
        # history for the lead/lag pass below, so the cap rides the
        # SAME window spec as a row_number filter: Catalyst plans one
        # exchange and one sort with the rank Window, the filter, and
        # the lead/lag Window stacked on top — no extra shuffle, no
        # join, ~zero overhead when no whale exists. Capped-user
        # counts surface as observed metrics (path_cap), emitted from
        # the pre-filter node so over-cap keys are visible.
        df = df.withColumn("__rn", F.row_number().over(w))
        df = df.observe(
            "path_cap",
            F.sum(
                F.when(F.col("__rn") == max_rows_per_user + 1, 1)
                .otherwise(0)
            ).alias("keys_capped"),
            F.max("__rn").alias("max_key_rows"),
        )
        df = df.filter(F.col("__rn") <= max_rows_per_user).drop("__rn")
    shift = F.lead if direction == "forward" else F.lag
    budget = (
        F.expr(f"INTERVAL {int(within.total_seconds())} SECOND")
        if within is not None
        else None
    )

    step_cols: list[Column] = []
    proj = [F.col(c) for c in (group_col, EVENT_TIME_COL, EVENT_ID_COL,
                               name_col, "__anchor")]
    for i in range(1, steps):
        ev_i = shift(F.col(name_col), i).over(w)
        if budget is not None:
            ts_i = shift(F.col(EVENT_TIME_COL), i).over(w)
            in_budget = (
                ts_i <= F.col(EVENT_TIME_COL) + budget
                if direction == "forward"
                else ts_i >= F.col(EVENT_TIME_COL) - budget
            )
            ev_i = F.when(in_budget, ev_i)
        name = f"__step_{i}"
        proj.append(ev_i.alias(name))
        step_cols.append(F.col(name))

    seq = df.select(*proj).filter(F.col("__anchor")).drop("__anchor")
    return seq, step_cols


def event_paths(
    events: DataFrame,
    anchor: EventRef,
    time: QueryTime,
    steps: int = 4,
    direction: str = "forward",
    within: Optional[dt.timedelta] = None,
    top_k: int = 50,
    filters: Sequence[PropFilter] = (),
    exclude_events: Sequence[str] = (),
    group_col: str = EVENT_USER_COL,
    name_col: str = EVENT_NAME_COL,
    max_rows_per_user: Optional[int] = None,
) -> DataFrame:
    """Top-k event paths from (forward) or into (backward) an anchor.

    Output: (path, n_starts, n_users) — ``path`` is the
    chronologically-ordered ``SEP``-joined event sequence including
    the anchor; ``n_starts`` counts anchor occurrences (a user
    contributes once per anchor event); ``n_users`` distinct users.
    Deterministic: ordered by n_starts DESC then path ASC, so the
    top-k cut is stable under partitioning.
    """
    seq, step_cols = _sequence_frame(
        events, anchor, time, steps, direction, within,
        filters, exclude_events, group_col, name_col, max_rows_per_user,
    )
    # chronological rendering: forward = anchor, s1, s2…; backward =
    # …s2, s1, anchor. concat_ws skips NULLs, and NULL steps are
    # always a suffix (forward) / prefix (backward) of the
    # chronological list, so the rendered string is the true prefix.
    parts = (
        [F.col(name_col), *step_cols]
        if direction == "forward"
        else [*reversed(step_cols), F.col(name_col)]
    )
    return (
        seq.select(
            F.col(group_col),
            F.concat_ws(SEP, *parts).alias("path"),
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_starts"),
            F.count_distinct(F.col(group_col)).alias("n_users"),
        )
        .orderBy(F.desc("n_starts"), F.asc("path"))
        .limit(top_k)
    )


def path_dropoff(
    events: DataFrame,
    anchor: EventRef,
    time: QueryTime,
    steps: int = 4,
    direction: str = "forward",
    within: Optional[dt.timedelta] = None,
    filters: Sequence[PropFilter] = (),
    exclude_events: Sequence[str] = (),
    group_col: str = EVENT_USER_COL,
    name_col: str = EVENT_NAME_COL,
    max_rows_per_user: Optional[int] = None,
) -> DataFrame:
    """Per-step event distribution after/before the anchor — the
    sankey feed. Output: (step, next_event, n_starts, n_users) where
    step i counts anchors whose i-th neighbour (within budget) is
    ``next_event``; dropped-off anchors simply stop appearing at
    deeper steps, so per-step totals are monotone non-increasing.
    """
    seq, step_cols = _sequence_frame(
        events, anchor, time, steps, direction, within,
        filters, exclude_events, group_col, name_col, max_rows_per_user,
    )
    exploded = seq.select(
        F.col(group_col),
        F.posexplode(F.array(*step_cols)).alias("__pos", "next_event"),
    ).filter(F.col("next_event").isNotNull())
    return (
        exploded.groupBy(
            (F.col("__pos") + 1).cast("int").alias("step"),
            "next_event",
        )
        .agg(
            F.count(F.lit(1)).alias("n_starts"),
            F.count_distinct(F.col(group_col)).alias("n_users"),
        )
    )
