"""Streaming growth-accounting ledger — ``applyInPandasWithState``.

The batch twin (operators/engagement.growth_accounting) classifies
every (user, bucket) as new / retained / resurrected and attributes
churn; this maintains the same ledger CONTINUOUSLY as events arrive.

Late data is the hard part: a user who read "resurrected" at week 4
becomes "retained" the moment week-3 activity arrives late, and the
week-3 churn row stops existing. Row-level incremental emission would
therefore need retractions. Instead each update RE-EMITS the user's
whole ledger (their buckets-seen set is one row per period — a year
of weeks is 52 integers) under a per-user ``version`` that grows with
the bucket count; a consumer keeps only each user's max-version rows
(the upsert-by-key pattern streaming funnel's sink documents). Counts
group the retained rows by (bucket, kind) at read time; the batch
operator's window-edge churn cap is likewise a read-time concern —
apply ``bucket <= max(observed bucket)`` when aggregating, exactly
what the differential test does.

Scale shape: state is partitioned by user in the state store
(RocksDB-backed on a real cluster); each micro-batch shuffles only
its delta by user; the pandas kernel touches one user's ≤ #buckets
integers. Nothing global, no skew (a whale user still has at most
#buckets state entries).
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import EVENT_TIME_COL, EVENT_USER_COL

_EPOCH = dt.date(1970, 1, 1)

_STATE_SCHEMA = T.StructType(
    [T.StructField("bucket_days", T.ArrayType(T.LongType()))]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField(EVENT_USER_COL, T.LongType()),
        T.StructField("bucket", T.DateType()),
        T.StructField("kind", T.StringType()),
        T.StructField("version", T.LongType()),
    ]
)


def user_ledger(days: list, step: int) -> list:
    """(bucket_day, kind) rows for one user's sorted active-day list —
    the single-user core of the batch operator's classification,
    shared with the differential test as the executable spec."""
    rows = []
    for i, b in enumerate(days):
        prev = days[i - 1] if i > 0 else None
        if prev is None:
            kind = "new"
        elif prev + step == b:
            kind = "retained"
        else:
            kind = "resurrected"
        rows.append((b, kind))
        nxt = days[i + 1] if i + 1 < len(days) else None
        if nxt is None or nxt > b + step:
            rows.append((b + step, "churned"))
    return rows


def _idx_to_date(idx: int, period: str) -> dt.date:
    """Inverse of the stream's period-index projection: day/week
    indexes are days since epoch; month indexes count months since
    1970-01 (months have no fixed day step, so they get their own
    index space where consecutive means step 1)."""
    if period == "month":
        return dt.date(1970 + idx // 12, idx % 12 + 1, 1)
    return _EPOCH + dt.timedelta(days=idx)


def _make_update(step: int, period: str):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        known = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            known.update(int(d) for d in pdf["__day"])
        days = sorted(known)
        state.update((days,))
        version = len(days)
        out = [
            (user, _idx_to_date(b, period), kind, version)
            for b, kind in user_ledger(days, step)
        ]
        yield pd.DataFrame(
            out, columns=[f.name for f in _OUTPUT_SCHEMA.fields])

    return _update


def streaming_growth_ledger(
    spark,
    schema,
    source_dir: str,
    period: str = "week",
) -> DataFrame:
    """Continuously-maintained growth ledger over a file stream.

    Returns the streaming DataFrame (Update mode): (user_id, bucket,
    kind, version) — consumers upsert by user keeping max-version
    rows, then count by (bucket, kind). ``period``: "day" | "week" |
    "month" (months ride their own index space — months since
    1970-01 — where consecutive means step 1, sidestepping the
    variable day count).
    """
    if period not in ("day", "week", "month"):
        raise ValueError("streaming growth period must be "
                         "day, week or month")
    step = 7 if period == "week" else 1
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    b = F.date_trunc(period, F.col(EVENT_TIME_COL)).cast("date")
    if period == "month":
        idx = ((F.year(b) - F.lit(1970)) * F.lit(12)
               + F.month(b) - F.lit(1)).cast("long")
    else:
        idx = F.datediff(b, F.lit(_EPOCH.isoformat()).cast("date")).cast(
            "long")
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .filter(F.col(EVENT_TIME_COL).isNotNull()
                & F.col(EVENT_USER_COL).isNotNull())
        .withColumn("__day", idx)
        .select(EVENT_USER_COL, "__day")
    )
    return stream.groupBy(F.col(EVENT_USER_COL)).applyInPandasWithState(
        _make_update(step, period),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
