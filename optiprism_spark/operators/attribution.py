"""Revenue / conversion attribution — beyond the reference.

The reference ships no attribution model (no attribution/touch types
anywhere in common/src or query/src); pairing conversions with the
marketing touches that preceded them is a core product-analytics
workload. Built Spark-first:

- touches: events matching the touch filter inside the query window,
  each stamped with a channel expression (a column, a JSON prop, any
  deterministic derivation);
- conversions: events matching the conversion filter, carrying a
  revenue column;
- pairing: per user, a touch is eligible for a conversion when it
  happens AT OR BEFORE the conversion and within ``lookback`` of it
  — the standard attribution window;
- models: ``first_touch`` (all credit to the earliest eligible
  touch), ``last_touch`` (the latest), ``linear`` (credit split
  evenly across eligible touches), ``time_decay`` (credit ∝
  0.5^(age/half_life) — recent touches earn more), ``position``
  (U-shaped: 40% first, 40% last, 20% split across the middles;
  100% / 50-50 for 1- and 2-touch paths). Conversions with no
  eligible touch are reported under the ``(none)`` channel rather
  than silently dropped — unattributed revenue is a number marketers
  watch.

Determinism: first/last picking orders by (ts, event_id) — a total
order — and first/last revenue sums whole conversion values through
exact decimals, so those models hash-match the DuckDB oracle
bit-for-bit. The FRACTIONAL models (linear/time_decay/position) are
made hash-exact too, via the drift-PSI recipe: every per-touch
weight and share is computed with correctly-rounded IEEE double ops
from exact integer inputs (epoch-microsecond ages, row positions),
rounded to 9 decimals, and cast to DECIMAL before any SUM — decimal
addition is exact and order-independent, so the per-channel
aggregates are bit-identical across engines and partitionings. The
round-9 costs ≤5e-10 of a conversion's credit, far below anything a
marketer reads off the report.

Plan shape (the 100 TB story): touches and conversions are two
narrow filtered projections of one events scan; the pairing is a
user-key equi-join with a time-range predicate — per-user fan-out is
touches/user × conversions/user inside the lookback, bounded in
practice by the lookback itself; the rank for first/last is a window
over (user, conversion) partitions — same user-hash partitioning as
the join, so no extra exchange — and the final per-channel aggregate
is partial-aggregated map-side. Nothing leaves the JVM.
"""

from __future__ import annotations

import datetime as dt
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dsl import EventRef, PropFilter, QueryTime
from ..exprs import full_filter
from ..operators.aggregates import DECIMAL_T
from ..schema import EVENT_ID_COL, EVENT_TIME_COL, EVENT_USER_COL

_MODELS = ("first_touch", "last_touch", "linear", "time_decay", "position")

#: decimal types for the deterministic fractional-credit pipeline:
#: shares carry 9 exact decimals, revenue contributions 6 (DECIMAL_T
#: scale) — both far inside double's 15-17 significant digits, so the
#: double→decimal round-trip is lossless
_SHARE_T = "decimal(19,9)"
_REV_T = "decimal(38,6)"

#: channel label for conversions with no eligible touch
NONE_CHANNEL = "(none)"


def attribution_report(
    events: DataFrame,
    channel_col: Column,
    touch_event: EventRef,
    conversion_event: EventRef,
    time: QueryTime,
    model: str = "last_touch",
    lookback: dt.timedelta = dt.timedelta(days=30),
    value_col: str = "value",
    filters: tuple[PropFilter, ...] = (),
    group_col: str = EVENT_USER_COL,
    max_touches_per_user: Optional[int] = None,
    half_life: dt.timedelta = dt.timedelta(days=1),
) -> DataFrame:
    """Per-channel attribution: (channel, n_conversions, revenue).

    ``n_conversions`` counts conversions credited to the channel
    (fractional under linear/time_decay/position — a conversion's
    single unit of credit is split across its eligible touches);
    ``revenue`` is the credited sum of ``value_col``. ``half_life``
    parameterizes ``time_decay``: a touch ``half_life`` older than
    the conversion earns half the weight of a simultaneous one.

    ``max_touches_per_user``: whale guard (OFF by default, lossy for
    over-cap users — same contract as funnel_report's
    ``max_rows_per_user``). The conversions×touches equi-join fans
    out touches/user × conversions/user on ONE key; a bot user with
    10^5 touches and 10^4 conversions inside the lookback is 10^9
    join rows in one task. The cap bounds the touch side per user via
    the funnel's one-pass cutoff fold (operators/whale.py), keeping
    the touches the model credits from: the chronologically FIRST cap
    under ``first_touch`` (the earliest eligible touch survives for
    any conversion whose window reaches it), the LAST cap otherwise
    (the latest eligible touch for recent conversions survives).
    Capped-user counts surface as observed metrics
    (``attr_touch_cap``) for the ops plane.
    """
    if model not in _MODELS:
        raise ValueError(f"model must be one of {_MODELS}, got {model!r}")
    if model == "time_decay" and half_life.total_seconds() <= 0:
        # half_life=0 makes the decay exponent age/0 — NaN for
        # simultaneous touches (which survives F.greatest under
        # Spark's NaN-is-greatest ordering and casts to a NULL
        # decimal weight); a negative half_life silently INVERTS the
        # decay so older touches earn more credit. Both are silent
        # wrong answers — fail loudly (the server surfaces a 400).
        raise ValueError(
            f"time_decay half_life must be positive, got {half_life}")

    t_cond = full_filter(time, touch_event, filters)
    touches = (events.filter(t_cond) if t_cond is not None else events).select(
        F.col(group_col),
        channel_col.alias("__channel"),
        F.col(EVENT_TIME_COL).alias("__t_ts"),
        F.col(EVENT_ID_COL).alias("__t_id"),
    )
    if max_touches_per_user is not None:
        from .whale import cap_rows_per_key

        touches = cap_rows_per_key(
            touches, group_col, max_touches_per_user, "__t_ts", "__t_id",
            keep="first" if model == "first_touch" else "last",
            observe_as="attr_touch_cap",
        )
    c_cond = full_filter(time, conversion_event, filters)
    convs = (events.filter(c_cond) if c_cond is not None else events).select(
        F.col(group_col),
        F.col(EVENT_ID_COL).alias("__c_id"),
        F.col(EVENT_TIME_COL).alias("__c_ts"),
        F.col(value_col).alias("__value"),
    )

    # ONE left-outer range join pairs every conversion with its
    # eligible touches AND carries no-touch conversions through as a
    # single null-touch row — the previous two-pass shape (inner join
    # + anti-join for the '(none)' bucket) re-ran the whole pairing a
    # second time; at 100 TB that is 2x the dominant cost for a
    # row-count the left join produces for free.
    look = F.expr(f"INTERVAL {int(lookback.total_seconds())} SECOND")
    touches = touches.withColumnRenamed(group_col, "__t_user")
    joined = convs.join(
        touches,
        (F.col(group_col) == F.col("__t_user"))
        & (F.col("__t_ts") <= F.col("__c_ts"))
        & (F.col("__t_ts") >= F.col("__c_ts") - look),
        "left_outer",
    ).drop("__t_user")
    # parsed-SQL from here down (guide §7.3): the Column-tree credit
    # pipeline was ~1100 py4j round-trips of construction per call.
    # Expressions are term-for-term identical; double literals carry
    # D suffixes, decimal casts name the same types.
    # the '(none)' bucket is exactly the UNMATCHED conversions (no
    # eligible touch); a matched touch whose channel value is NULL
    # stays its own (null) group — coalescing on __channel conflated
    # the two, crediting null-channel touches as "unattributed" while
    # the DuckDB oracle keeps them separate (GROUP BY on the raw
    # channel). __t_id is never null on a matched row, so the
    # unmatched predicate is the precise discriminator.
    channel_sql = (f"CASE WHEN __t_id IS NULL THEN '{NONE_CHANNEL}' "
                   "ELSE __channel END")

    if model in ("first_touch", "last_touch"):
        order = ("__t_ts ASC, __t_id ASC" if model == "first_touch"
                 else "__t_ts DESC, __t_id DESC")
        # an unmatched conversion is alone in its partition — its
        # null-touch row ranks 1 and credits NONE_CHANNEL
        credited = (
            joined.selectExpr(
                "*",
                f"row_number() OVER (PARTITION BY `{group_col}`, __c_id "
                f"ORDER BY {order}) AS __rn")
            .filter(F.col("__rn") == 1)
            .selectExpr(f"{channel_sql} AS __channel", "__value")
        )
        per_channel = credited.groupBy("__channel").agg(
            F.expr("count(1) AS n_conversions"),
            F.expr(f"cast(sum(cast(__value AS {DECIMAL_T})) AS double)"
                   " AS revenue"),
        )
        return per_channel.selectExpr(
            "__channel AS channel", "n_conversions", "revenue")

    # fractional models (linear / time_decay / position): split each
    # conversion's unit of credit across its eligible touches through
    # the deterministic share pipeline (module docstring) — per-touch
    # weight → round-9 → decimal; per-conversion normalization in
    # doubles over those exact decimals → round-9 → decimal; all SUMs
    # over decimals (exact, order-independent). Window partitions are
    # (user, conversion) — the same user-hash exchange the join
    # already produced, so no extra shuffle.
    wc_sql = f"PARTITION BY `{group_col}`, __c_id"
    if model == "linear":
        weight = "1.0D"
    elif model == "time_decay":
        # exact integer age in microseconds; the division and pow are
        # single correctly-rounded double ops on identical inputs in
        # both engines (same class as drift's ln / win_logarithmic)
        age_us = "(unix_micros(__c_ts) - unix_micros(__t_ts))"
        # floored at the round-9 quantum: a touch older than ~30
        # half-lives keeps weight 1e-9 instead of rounding to exactly
        # 0 — without the floor, a conversion whose EVERY touch is
        # that old has W = 0 and the share normalization divides by
        # zero (found by the r14 attribution fuzz, seed 1400003);
        # touches at the floor split equally, the only regime where
        # the quantization binds
        hl_us = half_life.total_seconds() * 1e6
        weight = (f"greatest(1E-9D, power(0.5D, "
                  f"cast({age_us} as double) / {hl_us!r}D))")
    else:  # position (U-shaped)
        rn = (f"row_number() OVER ({wc_sql} "
              "ORDER BY __t_ts ASC, __t_id ASC)")
        k = f"count(1) OVER ({wc_sql})"
        # 40/20/40 as relative weights — normalization makes k=1 a
        # 100% path and k=2 a 50/50 split automatically
        weight = (f"CASE WHEN {rn} = 1 OR {rn} = {k} THEN 0.4D "
                  f"ELSE 0.2D / cast({k} - 2 as double) END")
    # an unmatched conversion's single null-touch row takes weight 1
    # and normalizes to share exactly 1.000000000 — the whole credit
    # lands on NONE_CHANNEL with no separate aggregation pass
    weight = f"CASE WHEN __t_id IS NULL THEN 1.0D ELSE {weight} END"
    wtd = joined.selectExpr(
        "*", f"cast(round({weight}, 9) as {_SHARE_T}) AS __w")
    share = (f"cast(round(cast(__w as double) / "
             f"cast(sum(__w) OVER ({wc_sql}) as double), 9) "
             f"as {_SHARE_T})")
    split = wtd.selectExpr("*", f"{share} AS __share").selectExpr(
        f"{channel_sql} AS __channel",
        "__share",
        f"cast(round(cast(__share as double) * __value, 6) as {_REV_T})"
        " AS __rev",
    )
    per_channel = split.groupBy("__channel").agg(
        F.expr("cast(sum(__share) as double) AS n_conversions"),
        F.expr("cast(sum(__rev) as double) AS revenue"),
    )
    return per_channel.selectExpr(
        "__channel AS channel", "n_conversions", "revenue")
