"""Streaming maintenance for the durable ANN index (r15).

The IvfStore (operators/ivf_store.py) is the similarity family's
maintained artifact; this module gives it the same deployment shape
as every other store: a Structured Streaming channel that folds each
micro-batch of newly-ingested embeddings into the index — assignment
against the FROZEN quantizer (per-batch cost follows the batch),
with a drift-triggered retrain when the appended population's
centroid moves past the declared threshold
(drift.embedding_centroid_drift). Mirrors
streaming/audience.streaming_kmv_maintenance /
streaming/rollup.streaming_rollup_maintenance.

Exactly-once shape: the store's (stream_id, batch_id) pointer ledger
makes a re-delivered batch a no-op (foreachBatch re-delivers the
last uncommitted batch after a checkpoint restart); a crash between
the parquet append and the pointer commit re-applies one batch —
rebuild repairs, and on a transactional lake both are one commit
(IvfStore docstring).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

#: stream identity in the store's replay ledger
STREAM_ID = "ivf_maintenance"


def streaming_ivf_maintenance(
    spark: SparkSession,
    schema,
    source_dir: str,
    store,
    checkpoint_dir: str,
    drift_threshold: float = 0.02,
    trigger_once: bool = False,
) -> StreamingQuery:
    """Keep an IvfStore fresh from embedding parquet files landing
    under ``source_dir``. ``store`` must be built (rebuild) before
    the stream starts — cold-starting an index from a stream would
    train the quantizer on whichever batch happened to arrive first."""

    def fold(batch_df, batch_id: int) -> None:
        store.maintain(
            batch_df.sparkSession, batch_df,
            drift_threshold=drift_threshold,
            stream_id=STREAM_ID, batch_id=int(batch_id))

    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fold)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
