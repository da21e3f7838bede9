"""Window-analysis + sessionization oracle suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.windows import compare_previous, cumulative, logarithmic, rolling_average
from ..registry import query
from ..schema import load_table
from ..streaming.sessionize import session_stats, synthesize_session_begin
from . import _sql as S

_BASE = f"""
    base AS (
      SELECT {S.bucket('day')} AS bucket, event_type, COUNT(*) AS n
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1, 2
    )
"""


def _daily_counts(spark, sf_dir):
    import datetime as dt

    from ..dsl import EventQuery, EventRef, EventSegmentationRequest, PropertyRef, QueryTime, SegQuery, TimeIntervalUnit
    from ..operators.aggregates import event_segmentation_one

    req = EventSegmentationRequest(
        time=QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59)),
        interval=TimeIntervalUnit.DAY,
        events=[],
        breakdowns=[PropertyRef.column("event_type")],
    )
    eq = EventQuery(EventRef(), [SegQuery("count_events", alias="n")])
    return event_segmentation_one(load_table(spark, sf_dir, "events"), req, eq)


@query(
    "win_rolling_avg",
    oracle=f"""
    WITH {_BASE}
    SELECT bucket, event_type,
           AVG(n) OVER (PARTITION BY event_type
                        ORDER BY CAST(epoch(bucket) / 86400 AS BIGINT)
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n
    FROM base
    """,
)
def win_rolling_avg(spark, sf_dir):
    """Analysis::RollingAverage — declared in the reference DSL,
    unimplemented there (SURVEY §2.7); Spark window, 7-day trailing."""
    return rolling_average(_daily_counts(spark, sf_dir), ["n"], partition_cols=["event_type"])


@query(
    "win_logarithmic",
    oracle=f"""
    WITH {_BASE}
    SELECT bucket, event_type,
           CASE WHEN n > 0 THEN round(log10(CAST(n AS DOUBLE)), 9) END AS n
    FROM base
    """,
)
def win_logarithmic(spark, sf_dir):
    """Analysis::Logarithmic — declared in the reference DSL,
    unimplemented there (common/src/event_segmentation.rs:24-42);
    log10 display transform of the metric columns. Rounded to 9
    digits on both sides: JVM and libm log10 differ in the last ulp."""
    out = logarithmic(_daily_counts(spark, sf_dir), ["n"])
    return out.withColumn("n", F.round(F.col("n"), 9))


@query(
    "win_cumulative",
    oracle=f"""
    WITH {_BASE}
    SELECT bucket, event_type,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
    FROM base
    """,
)
def win_cumulative(spark, sf_dir):
    return cumulative(_daily_counts(spark, sf_dir), ["n"], partition_cols=["event_type"])


@query(
    "win_period_compare",
    oracle=f"""
    WITH {_BASE}
    SELECT bucket, event_type, n,
           MAX(n) OVER (PARTITION BY event_type ORDER BY CAST(epoch(bucket) / 86400 AS BIGINT) RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS n_prev,
           CASE WHEN MAX(n) OVER (PARTITION BY event_type ORDER BY CAST(epoch(bucket) / 86400 AS BIGINT) RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) IS NOT NULL
                 AND MAX(n) OVER (PARTITION BY event_type ORDER BY CAST(epoch(bucket) / 86400 AS BIGINT) RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) <> 0
                THEN CAST(n - MAX(n) OVER (PARTITION BY event_type ORDER BY CAST(epoch(bucket) / 86400 AS BIGINT) RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS DOUBLE)
                     / CAST(MAX(n) OVER (PARTITION BY event_type ORDER BY CAST(epoch(bucket) / 86400 AS BIGINT) RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS DOUBLE) * 100
           END AS n_change_pct
    FROM base
    """,
)
def win_period_compare(spark, sf_dir):
    """Compare{offset=7, day} period-over-period (reference DSL
    Compare, engine-side unimplemented)."""
    return compare_previous(_daily_counts(spark, sf_dir), ["n"], offset=7, partition_cols=["event_type"])


_SESSIONIZE = """
    x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
"""


@query(
    "session_stats_per_user",
    oracle=f"""
    WITH {_SESSIONIZE},
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    ),
    ps AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us
      FROM s GROUP BY 1, 2
    )
    SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(dur_us) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE) AS avg_session_secs
    FROM ps GROUP BY 1
    """,
)
def session_stats_per_user(spark, sf_dir):
    """Lag-gap sessionization (30-min gap): per-user session count,
    events and mean duration."""
    return session_stats(load_table(spark, sf_dir, "events"))


@query(
    "session_begin_daily",
    oracle=f"""
    WITH {_SESSIONIZE}
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n
    FROM x WHERE new_s = 1 GROUP BY 1
    """,
)
def session_begin_daily(spark, sf_dir):
    """Synthesized `Session Begin` events per day (reference ingester
    injection, track.rs:44-52, done declaratively at read)."""
    events = load_table(spark, sf_dir, "events")
    out = synthesize_session_begin(events)
    return (
        out.filter(F.col("event_type") == "Session Begin")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "session_duration_histogram",
    oracle=f"""
    WITH {_SESSIONIZE},
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    ),
    ps AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us
      FROM s GROUP BY 1, 2
    )
    SELECT CAST(floor(dur_us / 60000000) * 60 AS BIGINT) AS bucket_secs,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM ps GROUP BY 1
    """,
)
def session_duration_histogram(spark, sf_dir):
    """Session-duration distribution (60-second buckets, label =
    lower edge): the engagement-depth curve — pure integer micros
    arithmetic, histogram-cardinality output."""
    from ..streaming.sessionize import (
        session_duration_histogram as _hist,
    )

    return _hist(load_table(spark, sf_dir, "events"))
