"""Multimodal columns — image/audio/video as opaque binary + metadata.

The pattern for 100 TB multimodal training-data pipelines: media
payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each Python worker touches one columnar
batch at a time (bounded memory, no per-row serde).

Decode is REAL for PNG and WAV via media_codec.py (stdlib zlib/wave
decoders — full baseline 8-bit PNG with all five scanline filters,
16-bit PCM WAV): ``decode_stub=False`` round-trips genuine format
bytes inside the mapInPandas stage, and ``synthesize_media`` builds
real PNG/WAV payloads to feed it. Formats that need external codecs
(JPEG, MP3, MP4 frame extraction — PIL/librosa/ffmpeg are not in
this container) raise a clear ValueError at the same seam; plug a
real library into ``_decode_array`` when available.
``decode_stub=True`` keeps the deterministic fake decoder for
payloads that are not media at all (e.g. text-derived fixtures).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._util import spread

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
    """Deterministic stand-in for payloads that are not real media
    (text-derived fixtures): md5-seeded floats."""
    h = hashlib.md5(payload).digest()
    return [((h[i % 16] * 31 + i) % 256) / 255.0 for i in range(dim)]


def _decode_array(payload: bytes):
    """Sniff + REALLY decode a media payload -> (kind, float ndarray,
    normalization scale). The extension seam for further codecs."""
    import numpy as np

    from .media_codec import decode_png, decode_wav

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image", decode_png(payload).astype("float64").ravel(), 255.0
    if payload[:4] == b"RIFF":
        _, samples = decode_wav(payload)
        return "audio", samples.astype("float64").ravel(), 32768.0
    raise ValueError(
        "unsupported media format (PNG/WAV decode natively; JPEG/MP3/MP4 "
        "need PIL/librosa/ffmpeg — not in this image)"
    )


def _real_decode(payload: bytes, dim: int) -> list[float]:
    """Real decode -> fixed-dim feature: first ``dim`` normalized
    values, zero-padded (a stand-in featurizer over genuinely decoded
    arrays; swap in an embedding model at the same seam)."""
    _, arr, scale = _decode_array(payload)
    vals = [float(v) / scale for v in arr[:dim]]
    return vals + [0.0] * (dim - len(vals))


def extract_features(
    media: DataFrame, dim: int = 8, decode_stub: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches).

    ``decode_stub=False`` REALLY decodes each payload (PNG/WAV via
    media_codec; unsupported formats raise ValueError at the same
    seam). ``decode_stub=True`` uses the deterministic fake for
    non-media fixture payloads. The plumbing (schema, batching,
    column pruning of the payload column into the UDF) is the
    production shape either way.
    """

    from ..shipping import ensure_shipped

    ensure_shipped(media.sparkSession)
    decode = _fake_decode if decode_stub else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            payloads = pdf["payload"]
            if decode_stub:
                # content_hash and the stub features derive from the
                # SAME md5 digest — hash each payload once per row,
                # not twice (the digest's hex IS hexdigest, and
                # _fake_decode's arithmetic reads digest bytes)
                digests = payloads.map(lambda b: md5(b).digest())
                features = digests.map(
                    lambda h: [((h[i % 16] * 31 + i) % 256) / 255.0
                               for i in range(dim)])
                hashes = digests.map(bytes.hex)
            else:
                hashes = payloads.map(lambda b: md5(b).hexdigest())
                features = payloads.map(lambda b: decode(bytes(b), dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": hashes,
                    "feature": features,
                }
            )

    # spread: the Python decode kernel is per-row CPU; compact media
    # parquet (one row group per file) would otherwise pin the whole
    # mapInPandas stage to n_files cores. No-op once splits >= cores.
    return spread(media.select("media_id", "payload")).mapInPandas(
        run, FEATURE_SCHEMA)


#: synthesis parameters: 16x16 gray PNGs, 256-sample 16 kHz WAVs
SYNTH_SIDE = 16
SYNTH_SAMPLES = 256
SYNTH_RATE = 16000

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("value_sum", T.LongType()),
        T.StructField("value_min", T.LongType()),
        T.StructField("value_max", T.LongType()),
    ]
)


def synthesize_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a media table with REAL format payloads: even ids get a
    16x16 grayscale PNG whose pixel[i] = (id*31 + i) % 256 (encoder
    cycles scanline filters, so decoding requires true unfiltering);
    odd ids get a 256-sample WAV with sample[i] = ((id*7 + i*13) %
    65536) - 32768. Closed-form content is what makes decoded output
    independently checkable (the DuckDB oracle recomputes the same
    stats arithmetically — it cannot decode PNG, but it doesn't need
    to: the pipeline's decode must reproduce the formula or the hash
    check fails)."""
    import numpy as np

    from ..shipping import ensure_shipped
    from .media_codec import encode_png, encode_wav

    ensure_shipped(ids.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        side, n_s = SYNTH_SIDE, SYNTH_SAMPLES
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].astype("int64"):
                mid = int(mid)
                if mid % 2 == 0:
                    px = ((mid * 31 + np.arange(side * side)) % 256).astype(np.uint8)
                    rows.append(
                        (mid, encode_png(px.reshape(side, side)),
                         {"kind": "image", "format": "png", "width": side,
                          "height": side, "duration_ms": None})
                    )
                else:
                    s = (((mid * 7 + np.arange(n_s) * 13) % 65536) - 32768).astype(
                        np.int16
                    )
                    rows.append(
                        (mid, encode_wav(s, SYNTH_RATE),
                         {"kind": "audio", "format": "wav", "width": None,
                          "height": None,
                          "duration_ms": n_s * 1000 // SYNTH_RATE})
                    )
            yield pd.DataFrame(
                {"media_id": [r[0] for r in rows],
                 "payload": [r[1] for r in rows],
                 "meta": [r[2] for r in rows]}
            )

    return ids.select(id_col).mapInPandas(run, MEDIA_SCHEMA)


def decoded_stats(media: DataFrame) -> DataFrame:
    """REALLY decode every payload (PNG/WAV) and emit exact integer
    stats of the decoded array — the correctness surface for the
    decode stage (integer sums/extrema are bit-stable cross-engine,
    unlike float features)."""
    from ..shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    from .media_codec import decode_png, decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "kind", "width", "height",
                    "n_values", "value_sum", "value_min", "value_max")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    arr = decode_png(b)
                    kind = "image"
                    height, width = arr.shape[0], arr.shape[1]
                elif b[:4] == b"RIFF":
                    _, arr = decode_wav(b)
                    kind, width, height = "audio", None, None
                else:
                    raise ValueError("unsupported media payload (PNG/WAV)")
                ivals = arr.astype("int64").ravel()
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["width"].append(width)
                out["height"].append(height)
                out["n_values"].append(len(ivals))
                out["value_sum"].append(int(ivals.sum()))
                out["value_min"].append(int(ivals.min()))
                out["value_max"].append(int(ivals.max()))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, DECODED_SCHEMA)


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
