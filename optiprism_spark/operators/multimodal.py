"""Multimodal columns — image/audio/video as opaque binary + metadata.

The pattern for 100 TB multimodal training-data pipelines: media
payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each Python worker touches one columnar
batch at a time (bounded memory, no per-row serde).

The actual codec work (PIL/librosa/ffmpeg) is STUBBED — the image and
audio libraries are not in this container. The Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and
tested; `decode_stub=True` swaps in a deterministic fake decoder so
pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image | audio | video
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents fixture: payload =
    utf-8 bytes, metadata synthesized — stands in for a real
    (id, bytes, meta) media parquet."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("raw").alias("format"),
            (F.length("text") % 1024).cast("int").alias("width"),
            (F.length("text") % 768).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded floats.
    Replace with PIL/torchvision decode when available."""
    h = hashlib.md5(payload).digest()
    return [((h[i % 16] * 31 + i) % 256) / 255.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches).

    With ``decode_stub=False`` this raises NotImplementedError at
    execution time — the seam where a real image/audio decoder plugs
    in. The plumbing (schema, batching, column pruning of the payload
    column into the UDF) is the production shape either way.
    """

    from ..shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa — not in this image"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": payloads.map(lambda b: _fake_decode(bytes(b), dim)),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: metadata updated eagerly; payload transform stubbed
    (identity) until a codec is available — the plan shape (narrow map,
    no shuffle) is what matters."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.kind").alias("kind"),
            F.col("meta.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode per-frame timestamps from
    metadata (decode stubbed). Yields (media_id, frame_ts_ms) rows —
    the partition-parallel shape a real sampler would fill with
    frames."""
    frames = F.sequence(
        F.lit(0),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return media.select(
        "media_id", F.explode(frames).alias("frame_ts_ms")
    )
