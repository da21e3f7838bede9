"""Streaming maintenance for the (dt, user) activity store (r15).

The UserDayStore (userday.py) serves the routed RFM / growth-
accounting surfaces; this channel keeps it fresh from event parquet
files landing under a source directory — the same deployment shape
as streaming/rollup.streaming_rollup_maintenance, sharing the
store's (stream_id, batch_id) replay ledger so a re-delivered
micro-batch after a checkpoint restart never double-counts a user's
day activity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..userday import UserDayStore


def streaming_user_day_maintenance(
    spark: SparkSession,
    schema,
    source_dir: str,
    store: UserDayStore,
    checkpoint_dir: str,
    stream_id: str = "user_day_maintenance",
    trigger_once: bool = False,
) -> StreamingQuery:
    """Fold each micro-batch of raw events into the user-day store
    (day-aggregate the batch, merge-overwrite only its dt
    partitions). ``trigger_once`` drains and stops (the cron-style
    deployment); default runs continuously."""

    def fold(batch_df, batch_id: int) -> None:
        store.update(
            batch_df.sparkSession, batch_df,
            stream_id=stream_id, batch_id=int(batch_id),
        )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fold)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
