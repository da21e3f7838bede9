"""First-touch funnel — fully declarative DataFrame variant.

Complements operators/funnel.py. The greedy state machine is the
reference-exact operator but is not SQL-expressible; this variant
uses *first-touch* semantics, the standard product-analytics funnel
definition that IS expressible declaratively (and therefore oracle-
checkable and extremely fast at scale):

    t_0 = min ts of a step-0 event per user
    t_i = min ts of a step-i event with t_{i-1} < ts <= t_0 + window

Differences from the greedy machine: only the user's FIRST entry is
considered (no restart after window expiry), and excludes/constants
are not supported. For k steps the plan is k-1 broadcast-free
equi-joins on the user key plus per-user min-aggregations — every
stage is whole-stage-codegen'd JVM work, no Python.

At 100 TB: each stage shuffles the (already step-filtered, tiny)
per-user frames on user_id; the events scan happens once per step
with predicate pushdown on the step's event filter.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dsl import FunnelRequest
from ..exprs import event_spec_expression, full_filter, multi_or
from ..schema import EVENT_TIME_COL

from .aggregates import bucket_col


def funnel_first_touch_users(
    events: DataFrame, req: FunnelRequest,
    segment_users: Optional[DataFrame] = None,
    max_rows_per_user: Optional[int] = None,
) -> DataFrame:
    """Per-user first-touch conversion frame:
    (user_id, t_0 .. t_{k-1}) with nulls from the first missed step.

    ``max_rows_per_user``: whale-user guard, parity with the funnel
    machine's knob (operators/funnel.py). The single-pass aggregate
    below buffers one collect_list of step-i timestamps per user —
    bounded by that user's step-i event count, so a bot user with
    millions of matching events is one multi-million-element
    aggregation buffer (guide §2.5/§5). The guard pre-prunes each
    user to their chronologically FIRST ``cap`` matching rows BEFORE
    the user-hash exchange (operators/whale.cap_rows_per_key — one
    extra narrow pass, same exchange count downstream), so both the
    shuffle and the per-user array are bounded. Truncation is LOSSY
    for over-cap users by design (first-touch semantics read the
    earliest window, so the kept prefix is the relevant one);
    default None = exact, the oracle-checked configuration.
    Capped keys surface as observed metrics
    (``funnel_first_touch_whale_guard``: keys_capped/max_key_rows).

    Single-pass shape (guide §2.4): ONE scan — pre-filtered to rows
    matching any step, so the event-type OR pushes to parquet — and
    ONE user-hash exchange. The per-user aggregate carries min(step-0
    ts) plus one collect_list of step-i timestamps per later step
    (map-side partial aggregation applies; a user's list holds only
    their own step-i events in the window, the same per-user state
    the pandas funnel machine ships). Each t_i is then
    array_min(filter(a_i, t_{i-1} < x <= t_0 + window)) — pure
    per-row array expressions, no joins. The old shape re-scanned
    events per step and re-joined the growing `cur` frame twice per
    step (its subtree duplicated ~2^k times before AQE reuse); this
    one cannot duplicate anything."""
    k = len(req.steps)
    cond = full_filter(req.time, None, req.filters)
    df = events.filter(cond) if cond is not None else events
    if segment_users is not None:
        df = df.join(segment_users.hint("broadcast"), req.group_col, "left_semi")

    user = F.col(req.group_col)
    ts = F.col(EVENT_TIME_COL)
    step_exprs = [
        multi_or([event_spec_expression(s) for s in req.steps[i].events])
        for i in range(k)
    ]
    # rows matching no step contribute nothing — drop them before the
    # exchange (None = match-all step: keep everything)
    if all(e is not None for e in step_exprs):
        df = df.filter(multi_or(list(step_exprs)))
    if max_rows_per_user is not None:
        from ..schema import EVENT_ID_COL
        from .whale import cap_rows_per_key

        df = cap_rows_per_key(
            df, req.group_col, max_rows_per_user, EVENT_TIME_COL,
            EVENT_ID_COL, keep="first",
            observe_as="funnel_first_touch_whale_guard")

    def _match(i: int) -> Column:
        e = step_exprs[i]
        return e if e is not None else F.lit(True)

    aggs = [F.min(F.when(_match(0), ts)).alias("t_0")]
    aggs += [
        F.collect_list(F.when(_match(i), ts)).alias(f"__a{i}")
        for i in range(1, k)
    ]
    cur = (
        df.groupBy(user.alias("user_id"))
        .agg(*aggs)
        .filter(F.col("t_0").isNotNull())
    )
    window = F.expr(f"INTERVAL {req.window_ms * 1000} MICROSECOND")
    deadline = F.col("t_0") + window
    for i in range(1, k):
        prev = F.col(f"t_{i-1}")
        t_i = F.when(
            prev.isNotNull(),
            F.array_min(
                F.filter(
                    F.col(f"__a{i}"),
                    lambda x: (x > prev) & (x <= deadline),
                )
            ),
        )
        cur = cur.withColumn(f"t_{i}", t_i).drop(f"__a{i}")
    return cur.select("user_id", *[f"t_{i}" for i in range(k)])


def funnel_first_touch_report(
    events: DataFrame, req: FunnelRequest,
    segment_users: Optional[DataFrame] = None,
    max_rows_per_user: Optional[int] = None,
) -> DataFrame:
    """Per-bucket step totals + conversion ratio + avg seconds to
    convert, bucketed by each user's entry (t_0) timestamp.
    ``max_rows_per_user`` passes through to
    `funnel_first_touch_users` (whale guard, default off)."""
    k = len(req.steps)
    users = funnel_first_touch_users(
        events, req, segment_users, max_rows_per_user=max_rows_per_user)
    bucket = bucket_col(req.interval, "t_0")
    aggs = [
        F.sum(F.col(f"t_{i}").isNotNull().cast("long")).alias(f"step{i}_total")
        for i in range(k)
    ]
    # exact integer µs sum → one double division: oracle-reproducible
    aggs.append(
        F.sum(
            F.when(
                F.col(f"t_{k-1}").isNotNull(),
                F.unix_micros(F.col(f"t_{k-1}")) - F.unix_micros(F.col("t_0")),
            )
        ).alias("__sum_us")
    )
    out = users.groupBy(bucket.alias("bucket")).agg(*aggs)
    total0 = F.col("step0_total").cast("double")
    totalk = F.col(f"step{k-1}_total")
    return out.select(
        "bucket",
        *[f"step{i}_total" for i in range(k)],
        (totalk.cast("double") / total0 * 100).alias("conversion_ratio"),
        F.when(totalk > 0, (F.col("__sum_us") / F.lit(1e6)).cast("double") / totalk.cast("double"))
        .alias("avg_secs_to_convert"),
    )
