"""Reshape oracle suite — pivot / unpivot / Average / top-N series.

Exercises the full chart pipeline of queries/event_segmentation.py
(reference §3.1 step 4 plan chain) against explicit conditional-
aggregation SQL in DuckDB.
Final outputs are cast to DOUBLE on both sides: decimal is the exact
*internal* arithmetic type, but pandas renders Spark decimals as
``Decimal`` objects and DuckDB decimals as float64, which would
spuriously hash-mismatch.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _decimals_to_double(df):
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, T.DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )

from ..dsl import (
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    PropertyRef,
    SegQuery,
    TimeIntervalUnit,
)
from ..queries.event_segmentation import run_event_segmentation
from ..dsl import QueryTime
from ..registry import query
from ..schema import load_table
from . import _sql as S

_T0 = dt.datetime(2024, 1, 1)
_T1 = dt.datetime(2024, 1, 31, 23, 59, 59)
_DAYS = [(_T0 + dt.timedelta(days=i)).date().isoformat() for i in range(31)]


def _chart_oracle() -> str:
    """Conditional-aggregation equivalent of pivot+Average+top-3."""
    day_cols = ",\n           ".join(
        f"CAST(COALESCE(SUM(n) FILTER (WHERE d = DATE '{d}'), 0) AS DOUBLE) AS \"{d}\""
        for d in _DAYS
    )
    row_sum = " + ".join(f'"{d}"' for d in _DAYS)
    return f"""
    WITH base AS (
      SELECT event_type, {S.bucket('day')} AS d, COUNT(*) AS n
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1, 2
    ),
    pv AS (
      SELECT event_type, 'n' AS agg_name,
           {day_cols}
      FROM base GROUP BY 1
    )
    SELECT *, CAST(({row_sum}) AS DOUBLE) / 31.0 AS "Average"
    FROM pv
    QUALIFY dense_rank() OVER (ORDER BY "Average" DESC, event_type, agg_name) <= 3
    """


@query("seg_chart_pipeline", oracle=_chart_oracle())
def seg_chart_pipeline(spark, sf_dir):
    """Regular (chart) format: unpivot → pivot to 31 day columns →
    Average column → top-3 series (reference UnpivotNode + PivotNode +
    AggregateAndSortColumnsNode + LimitGroupsNode chain)."""
    req = EventSegmentationRequest(
        time=QueryTime.between(_T0, _T1),
        interval=TimeIntervalUnit.DAY,
        events=[EventQuery(EventRef(), [SegQuery("count_events", alias="n")])],
        breakdowns=[PropertyRef.column("event_type")],
    )
    events = load_table(spark, sf_dir, "events")
    return _decimals_to_double(
        run_event_segmentation(events, req, fmt="regular", series_limit=3)
    )


@query(
    "seg_unpivot_compact",
    oracle=f"""
    WITH base AS (
      SELECT {S.bucket('day')} AS bucket, COUNT(*) AS n, {S.sum_exact('value')} AS sum_v
      FROM events WHERE {S.ts_between(*S.T_FULL)} AND event_type = 'purchase'
      GROUP BY 1
    )
    SELECT bucket, 'n' AS agg_name, CAST(n AS DOUBLE) AS value FROM base
    UNION ALL
    SELECT bucket, 'sum_v' AS agg_name, CAST(sum_v AS DOUBLE) AS value FROM base
    """,
)
def seg_unpivot_compact(spark, sf_dir):
    """UnpivotNode: melt metric columns to (agg_name, value decimal)
    rows (reference logical_plan/unpivot.rs:22-144)."""
    from ..dsl import AggFn
    from ..operators.aggregates import event_segmentation_one
    from ..operators.reshape import unpivot_metrics

    req = EventSegmentationRequest(
        time=QueryTime.between(_T0, _T1), interval=TimeIntervalUnit.DAY, events=[]
    )
    eq = EventQuery(
        EventRef("purchase"),
        [
            SegQuery("count_events", alias="n"),
            SegQuery("aggregate_property", agg=AggFn.SUM, prop=PropertyRef.column("value"), alias="sum_v"),
        ],
    )
    long_df = event_segmentation_one(load_table(spark, sf_dir, "events"), req, eq)
    return _decimals_to_double(unpivot_metrics(long_df, ["bucket"], ["n", "sum_v"]))
