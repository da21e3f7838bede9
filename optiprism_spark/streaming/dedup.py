"""Streaming deduplication — the continuous-ingest companion to
``operators/dedup``.

A training-data pipeline ingests documents continuously; the batch
``exact_dedup`` (md5 → groupBy, `operators/dedup.py`) assumes a corpus
at rest and re-reads it per run. Structured Streaming's
``dropDuplicatesWithinWatermark`` instead keeps a state store keyed by
content hash: a duplicate arriving within the watermark of its first
copy is dropped, and state older than the watermark is evicted — so
state size is bounded by (arrival rate × watermark window), not corpus
size. That bound is the only shape that survives an unbounded stream;
an unwatermarked ``dropDuplicates`` would grow state forever.

Two layers, mirroring the reference's split between write-path and
read-path work (the reference dedups nothing itself — this extends the
engine the same way the streaming funnel does, SURVEY §2.12):

- in-window exactness: within one watermark horizon the output is
  exactly the batch survivor set (first arrival wins — equal to batch
  exact_dedup's lowest-id winner whenever ids are arrival-ordered,
  which ingest-assigned monotonic ids are).
- cross-horizon duplicates (a copy arriving days later) are the batch
  compaction job's business: the periodic ``exact_dedup`` /
  ``lsh_near_dup_pairs`` sweep over the settled table catches them.
  Streaming-dedup-then-compact is the standard lambda split; claiming
  unbounded exact streaming dedup would require unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"


def content_hash(text_col: str = "text") -> "F.Column":
    """The dedup key — identical to batch ``exact_dedup``'s md5 so the
    streaming pass and the compaction sweep agree on what 'same
    document' means."""
    return F.md5(F.col(text_col))


def streaming_exact_dedup(
    spark,
    schema,
    source_dir: str,
    time_col: str = "ingest_ts",
    text_col: str = "text",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Continuous exact dedup over a parquet-directory stream.

    Emits each distinct content exactly once per watermark horizon
    (first arrival wins); late duplicates beyond the watermark are
    out of scope by design (see module docstring). The state store
    holds one (hash → expiry) entry per distinct content seen within
    the horizon — at 100 TB/day and a 10-minute watermark that is
    minutes of distinct hashes, not the corpus.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withColumn("__h", content_hash(text_col))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


def batch_exact_dedup_first_arrival(
    docs: DataFrame,
    time_col: str = "ingest_ts",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch reference semantics for the streaming operator: first
    arrival (then lowest id as tie-break) per content hash — the frame
    the streaming output must equal within one watermark horizon.
    Differential-test oracle, also usable as the compaction sweep on
    an ingest-timestamped table."""
    from pyspark.sql import Window

    w = Window.partitionBy("__h").orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("__h", content_hash(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )
