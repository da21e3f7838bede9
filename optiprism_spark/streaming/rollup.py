"""Streaming rollup maintenance — the day-grain pre-aggregate kept
fresh by Structured Streaming instead of the batch compaction tick.

Beyond the reference (whose parts are only pre-aggregated never — the
scan reads raw parts per query, storage/src/db.rs:657-666): a file
stream over the ingest landing zone feeds each micro-batch into
``RollupStore.update`` via ``foreachBatch``. Exactly-once across
checkpoint restarts comes from the store's batch ledger — foreachBatch
re-delivers the last uncommitted batch on restart, and the
(stream_id, batch_id) guard makes the re-delivery a no-op — the
standard idempotent-foreachBatch pattern.

Scale: each micro-batch shuffles only its own rows (one day-grain
groupBy) and rewrites only the dt partitions it touches; state lives
in the store, not the stream, so the query itself is stateless and
restarts cold.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..rollup import RollupStore


def streaming_rollup_maintenance(
    spark: SparkSession,
    schema,
    source_dir: str,
    store: RollupStore,
    checkpoint_dir: str,
    stream_id: str = "rollup_maintenance",
    trigger_once: bool = False,
) -> StreamingQuery:
    """Start the maintenance stream: parquet files landing under
    ``source_dir`` are folded into ``store`` one micro-batch at a
    time. ``trigger_once`` drains what is currently available and
    stops (the cron-style deployment); default runs continuously."""

    def fold(batch_df, batch_id: int) -> None:
        store.update(
            batch_df.sparkSession, batch_df,
            stream_id=stream_id, batch_id=batch_id,
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
