"""Anomaly-flag oracle suite (operators/alerts.py).

The z arithmetic is mirrored expression-for-expression from exact
integer window sums — (ss − s·s/k)/(k−1) with the same association —
so even the doubles hash-match.
"""

from __future__ import annotations

import datetime as dt

from ..dsl import EventRef, QueryTime
from ..exprs import full_filter
from ..operators.alerts import anomaly_flags
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


@query(
    "alert_purchase_count_daily",
    oracle=f"""
    WITH series AS (
      SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
      FROM events
      WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      GROUP BY 1
    ), f AS (
      SELECT bucket, n,
             date_diff('day', DATE '1970-01-01', bucket) AS idx,
             COUNT(n) OVER w AS k,
             SUM(n) OVER w AS s,
             SUM(n * n) OVER w AS ss
      FROM series
      WINDOW w AS (ORDER BY date_diff('day', DATE '1970-01-01', bucket)
                   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT bucket, n,
           CASE WHEN ok THEN s / k END AS baseline_mean,
           CASE WHEN ok THEN (n - s / k) / sqrt((ss - s * s / k) / (k - 1)) END
             AS z_score,
           COALESCE(ok AND
             abs((n - s / k) / sqrt((ss - s * s / k) / (k - 1))) > 2.0,
             FALSE) AS is_anomaly
    FROM (SELECT f.*, (k >= 3 AND (ss - s * s / k) / (k - 1) > 0) AS ok FROM f) x
    """,
)
def alert_purchase_count_daily(spark, sf_dir):
    """Daily purchase counts with trailing-7-day z-scores and spike
    flags at |z| > 2 — the alerting primitive composed over a
    segmentation series; the current bucket is excluded from its own
    baseline."""
    events = load_table(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    cond = full_filter(_FULL, EventRef("purchase"))
    series = (
        events.filter(cond)
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return anomaly_flags(series, "n", window=7, z_threshold=2.0)


@query(
    "alert_robust_value_daily_by_type",
    oracle=f"""
    WITH series AS (
      SELECT {S.bucket('day')} AS bucket, event_type,
             {S.sum_exact('value')} AS n
      FROM events
      WHERE {S.ts_between(*S.T_FULL)} AND value IS NOT NULL
      GROUP BY 1, 2
    ), med AS (
      SELECT event_type, median(n) AS med FROM series GROUP BY 1
    ), mad AS (
      SELECT s.event_type, median(abs(s.n - m.med)) AS mad
      FROM series s JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT s.bucket, s.event_type, s.n,
           m.med AS baseline_median,
           CASE WHEN d.mad > 0
                THEN round((s.n - m.med) / (1.4826 * d.mad), 9) END
             AS robust_z,
           COALESCE(d.mad > 0 AND
             abs(round((s.n - m.med) / (1.4826 * d.mad), 9)) > 3.5,
             FALSE) AS is_anomaly
    FROM series s
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    """,
)
def alert_robust_value_daily_by_type(spark, sf_dir):
    """Per-event-type daily value sums swept with the Hampel
    (median/MAD) detector — the batch-audit companion to the trailing
    z-score: a mean/std baseline is poisoned by the very outliers it
    hunts, median/MAD have a 50% breakdown point. Each type gets its
    own independent robust baseline (`by=`); the series is
    post-aggregation tiny, so the two median passes and broadcast
    join-backs are free at any corpus size."""
    import pyspark.sql.functions as F

    from ..operators.aggregates import DECIMAL_T
    from ..operators.alerts import robust_anomaly_flags

    events = load_table(spark, sf_dir, "events")
    cond = full_filter(_FULL) & F.col("value").isNotNull()
    series = (
        events.filter(cond)
        .groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("bucket"),
            F.col("event_type"),
        )
        .agg(F.sum(F.col("value").cast(DECIMAL_T)).cast("double").alias("n"))
    )
    return robust_anomaly_flags(series, "n", threshold=3.5,
                                by=("event_type",))
