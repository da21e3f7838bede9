"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference has no stateful stream processing at all (SURVEY §2.12:
ingestion is synchronous row-at-a-time writes; "streaming" reduces to
read-your-writes freshness). This module goes beyond it with Spark's
arbitrary-stateful-processing primitive: a per-user running profile
(event count, value sum, last-seen timestamp, session count by
30-minute gap) maintained across micro-batches.

This is the scale shape for continuous per-entity state at 100 TB/day:
state lives in the state store partitioned by user (RocksDB-backed on
a real cluster — set ``spark.sql.streaming.stateStore.providerClass``
to the RocksDB provider), each micro-batch shuffles only its delta by
user, and the pandas kernel sees (key, iterator-of-batches, state).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schema import EVENT_TIME_COL, EVENT_USER_COL
from .sessionize import SESSION_GAP_US

#: (n_events, value_sum, last_seen_us, session_count)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
        T.StructField("session_count", T.LongType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField(EVENT_USER_COL, T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
        T.StructField("session_count", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user,) = key
    count, value_sum, last_seen, sessions = (
        state.get if state.exists else (0, 0.0, None, 0)
    )
    # concat ALL chunks before sorting — a group larger than one Arrow
    # batch arrives as multiple frames in arbitrary order, and sorting
    # per-chunk would corrupt the session-gap detection
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("__ts_us")
    for ts_us, value in zip(pdf["__ts_us"], pdf["value"]):
        if last_seen is None or ts_us - last_seen > SESSION_GAP_US:
            sessions += 1
        last_seen = int(ts_us)
        count += 1
        value_sum += float(value) if pd.notna(value) else 0.0
    state.update((count, value_sum, last_seen, sessions))
    yield pd.DataFrame(
        [(user, count, value_sum, last_seen, sessions)],
        columns=[f.name for f in _OUTPUT_SCHEMA.fields],
    )


def streaming_user_profiles(spark, schema, source_dir: str) -> DataFrame:
    """Continuously-updated per-user profile over a file stream.

    Returns the streaming DataFrame (Update output mode); attach a
    sink downstream. State never expires here
    (GroupStateTimeout.NoTimeout) — production would set a processing-
    or event-time timeout to bound the store.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        # null ts -> NaN -> int(NaN) ValueError in the state kernel
        .filter(F.col(EVENT_TIME_COL).isNotNull())
        .withColumn("__ts_us", F.unix_micros(F.col(EVENT_TIME_COL)))
    )
    return stream.groupBy(F.col(EVENT_USER_COL)).applyInPandasWithState(
        _update_profile,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
