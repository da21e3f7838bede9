"""Attribution oracle suite (beyond the reference — it ships no
attribution model; see operators/attribution.py).

First/last-touch models hash-match exactly: the (ts, event_id) pick
order is total and credited revenue sums whole conversion values
through exact decimals. The fractional models (linear / time_decay /
position) hash-match through the deterministic share pipeline
(operators/attribution.py module docstring): round-9 weights and
shares cast to DECIMAL before every SUM, so the aggregates are exact
and order-independent on both engines.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ..dsl import EventFilterSpec, EventRef, QueryTime
from ..operators.attribution import attribution_report
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))

#: touches = view|click (a custom-event OR), channel = the event type
_TOUCHES = EventRef(custom=[
    EventFilterSpec(EventRef("view")),
    EventFilterSpec(EventRef("click")),
])
_LOOKBACK_S = 7 * 86_400


def _oracle(order: str, touch_ets=("view", "click"),
            conv_et="purchase", lookback_s=_LOOKBACK_S,
            time=S.T_FULL) -> str:
    touches = ", ".join(f"'{t}'" for t in touch_ets)
    return f"""
    WITH t AS (
      SELECT user_id, event_type AS channel, ts AS t_ts, event_id AS t_id
      FROM events
      WHERE {S.ts_between(*time)} AND event_type IN ({touches})
    ), c AS (
      SELECT user_id, event_id AS c_id, ts AS c_ts, value
      FROM events
      WHERE {S.ts_between(*time)} AND event_type = '{conv_et}'
    ), m AS (
      SELECT c.user_id, c.c_id, c.value, t.channel, t.t_ts, t.t_id
      FROM c JOIN t USING (user_id)
      WHERE t.t_ts <= c.c_ts
        AND t.t_ts >= c.c_ts - INTERVAL {lookback_s} SECOND
    ), credited AS (
      SELECT channel, c_id, value FROM (
        SELECT m.*, row_number() OVER (
          PARTITION BY user_id, c_id ORDER BY {order}) AS rn
        FROM m) x WHERE rn = 1
    )
    SELECT channel, COUNT(*) AS n_conversions,
           {S.sum_exact('value')} AS revenue
    FROM credited GROUP BY 1
    UNION ALL
    SELECT '(none)', COUNT(*), {S.sum_exact('value')}
    FROM c WHERE c_id NOT IN (SELECT DISTINCT c_id FROM m)
    HAVING COUNT(*) > 0
    """


@query("attr_last_touch_revenue",
       oracle=_oracle("t_ts DESC, t_id DESC"))
def attr_last_touch_revenue(spark, sf_dir):
    """Last-touch revenue attribution: each purchase credits the
    latest view-or-click in the 7 days before it; untouched purchases
    report under '(none)'."""
    return attribution_report(
        load_table(spark, sf_dir, "events"),
        channel_col=F.col("event_type"),
        touch_event=_TOUCHES,
        conversion_event=EventRef("purchase"),
        time=_FULL, model="last_touch",
        lookback=dt.timedelta(seconds=_LOOKBACK_S),
    )


@query("attr_first_touch_revenue",
       oracle=_oracle("t_ts ASC, t_id ASC"))
def attr_first_touch_revenue(spark, sf_dir):
    """First-touch variant — credit to the earliest eligible touch
    (the acquisition-centric reading)."""
    return attribution_report(
        load_table(spark, sf_dir, "events"),
        channel_col=F.col("event_type"),
        touch_event=_TOUCHES,
        conversion_event=EventRef("purchase"),
        time=_FULL, model="first_touch",
        lookback=dt.timedelta(seconds=_LOOKBACK_S),
    )


def _frac_oracle(weight_sql: str, touch_ets=("view", "click"),
                 conv_et="purchase", lookback_s=_LOOKBACK_S,
                 time=S.T_FULL) -> str:
    """Fractional-model oracle: the deterministic share pipeline —
    round-9 weights/shares as DECIMAL(19,9), revenue contributions as
    DECIMAL(38,6), every SUM over decimals (exact, order-free)."""
    touches = ", ".join(f"'{t}'" for t in touch_ets)
    return f"""
    WITH t AS (
      SELECT user_id, event_type AS channel, ts AS t_ts, event_id AS t_id
      FROM events
      WHERE {S.ts_between(*time)} AND event_type IN ({touches})
    ), c AS (
      SELECT user_id, event_id AS c_id, ts AS c_ts, value
      FROM events
      WHERE {S.ts_between(*time)} AND event_type = '{conv_et}'
    ), m AS (
      SELECT c.user_id, c.c_id, c.c_ts, c.value, t.channel, t.t_ts, t.t_id
      FROM c JOIN t USING (user_id)
      WHERE t.t_ts <= c.c_ts
        AND t.t_ts >= c.c_ts - INTERVAL {lookback_s} SECOND
    ), pos AS (
      SELECT m.*,
             row_number() OVER (
               PARTITION BY user_id, c_id ORDER BY t_ts, t_id) AS rn,
             count(*) OVER (PARTITION BY user_id, c_id) AS k
      FROM m
    ), w AS (
      SELECT user_id, c_id, channel, value,
             CAST(round({weight_sql}, 9) AS DECIMAL(19,9)) AS wt
      FROM pos
    ), s AS (
      SELECT channel, value,
             CAST(round(
               CAST(wt AS DOUBLE) /
               CAST(SUM(wt) OVER (PARTITION BY user_id, c_id) AS DOUBLE),
               9) AS DECIMAL(19,9)) AS share
      FROM w
    )
    SELECT channel,
           CAST(SUM(share) AS DOUBLE) AS n_conversions,
           CAST(SUM(CAST(round(CAST(share AS DOUBLE) * value, 6)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM s GROUP BY 1
    UNION ALL
    SELECT '(none)', CAST(COUNT(*) AS DOUBLE), {S.sum_exact('value')}
    FROM c WHERE c_id NOT IN (SELECT DISTINCT c_id FROM m)
    HAVING COUNT(*) > 0
    """


@query("attr_linear_revenue", oracle=_frac_oracle("1.0"))
def attr_linear_revenue(spark, sf_dir):
    """Linear multi-touch: each purchase's credit split evenly across
    every view/click in the 7 days before it — the unweighted
    journey-wide reading."""
    return attribution_report(
        load_table(spark, sf_dir, "events"),
        channel_col=F.col("event_type"),
        touch_event=_TOUCHES,
        conversion_event=EventRef("purchase"),
        time=_FULL, model="linear",
        lookback=dt.timedelta(seconds=_LOOKBACK_S),
    )


_HL_S = 86_400  # one-day half-life


@query("attr_time_decay_revenue", oracle=_frac_oracle(
    f"greatest(1e-09, pow(0.5, CAST(epoch_us(c_ts) - epoch_us(t_ts)"
    f" AS DOUBLE) / {float(_HL_S) * 1e6!r}))"))
def attr_time_decay_revenue(spark, sf_dir):
    """Time-decay multi-touch: touch weight halves per day of age at
    conversion time — the recency-centric reading. Ages are exact
    integer microseconds; pow/divide are single correctly-rounded
    double ops, identical across engines (drift-PSI precedent)."""
    return attribution_report(
        load_table(spark, sf_dir, "events"),
        channel_col=F.col("event_type"),
        touch_event=_TOUCHES,
        conversion_event=EventRef("purchase"),
        time=_FULL, model="time_decay",
        lookback=dt.timedelta(seconds=_LOOKBACK_S),
        half_life=dt.timedelta(seconds=_HL_S),
    )


@query("attr_position_revenue", oracle=_frac_oracle(
    "CASE WHEN rn = 1 OR rn = k THEN 0.4"
    " ELSE 0.2 / CAST(k - 2 AS DOUBLE) END"))
def attr_position_revenue(spark, sf_dir):
    """Position-based (U-shaped) multi-touch: 40% to the first touch,
    40% to the last, 20% split across the middles (single-touch paths
    get 100%, two-touch 50/50 via weight normalization)."""
    return attribution_report(
        load_table(spark, sf_dir, "events"),
        channel_col=F.col("event_type"),
        touch_event=_TOUCHES,
        conversion_event=EventRef("purchase"),
        time=_FULL, model="position",
        lookback=dt.timedelta(seconds=_LOOKBACK_S),
    )
