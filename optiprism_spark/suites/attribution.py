"""Attribution oracle suite (beyond the reference — it ships no
attribution model; see operators/attribution.py).

First/last-touch models hash-match exactly: the (ts, event_id) pick
order is total and credited revenue sums whole conversion values
through exact decimals. The linear model's double splits are pinned
by a tolerance differential test in tests/test_attribution.py — the
one model where bit-equality is not mathematically meaningful.
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
