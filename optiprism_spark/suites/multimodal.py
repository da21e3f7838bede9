"""Multimodal plumbing suite.

The fake decoder is md5 arithmetic (operators/multimodal._fake_decode),
so the whole mapInPandas pipeline IS oracle-expressible: DuckDB
recomputes byte counts, content hashes and the feature codes from the
same digests. Feature floats are compared as their exact int codes
(value·255) to avoid float32-vs-float64 representation noise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, media_from_documents
from ..registry import query
from ..schema import load_table

_DIM = 8

#: digest byte i%16 of md5(text), as an int: hex pair -> int
_BYTE = "CAST(('0x' || substr(md5(text), ({i} % 16) * 2 + 1, 2)) AS INT)"
_CODES = ", ".join(f"(({_BYTE.format(i=i)} * 31 + {i}) % 256)" for i in range(_DIM))


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           strlen(text) AS n_bytes,
           md5(text) AS content_hash,
           array_to_string([{_CODES}], ',') AS feature_codes
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """binary-payload media table → mapInPandas feature extraction
    (stubbed decode, real batch plumbing). Features surface as exact
    int codes so the differential check is representation-stable."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(media_from_documents(docs), dim=_DIM)
    return feats.select(
        "media_id", "n_bytes", "content_hash",
        # comma-joined string, not an array column: array rendering
        # differs between Arrow/non-Arrow pandas conversion paths
        F.array_join(
            F.transform(F.col("feature"), lambda x: F.round(x * 255).cast("int")),
            ",",
        ).alias("feature_codes"),
    )


@query(
    "multimodal_decoded_stats",
    oracle="""
    WITH img AS (
      SELECT d.doc_id AS media_id, 'image' AS kind,
             16 AS width, 16 AS height,
             256::BIGINT AS n_values,
             SUM((d.doc_id * 31 + g.i) % 256)::BIGINT AS value_sum,
             MIN((d.doc_id * 31 + g.i) % 256)::BIGINT AS value_min,
             MAX((d.doc_id * 31 + g.i) % 256)::BIGINT AS value_max
      FROM documents d, generate_series(0, 255) AS g(i)
      WHERE d.doc_id % 2 = 0 GROUP BY d.doc_id
    ), aud AS (
      SELECT d.doc_id AS media_id, 'audio' AS kind,
             NULL::INT AS width, NULL::INT AS height,
             256::BIGINT AS n_values,
             SUM(((d.doc_id * 7 + g.i * 13) % 65536) - 32768)::BIGINT AS value_sum,
             MIN(((d.doc_id * 7 + g.i * 13) % 65536) - 32768)::BIGINT AS value_min,
             MAX(((d.doc_id * 7 + g.i * 13) % 65536) - 32768)::BIGINT AS value_max
      FROM documents d, generate_series(0, 255) AS g(i)
      WHERE d.doc_id % 2 = 1 GROUP BY d.doc_id
    )
    SELECT * FROM img UNION ALL SELECT * FROM aud
    """,
)
def multimodal_decoded_stats(spark, sf_dir):
    """REAL media decode, differentially checked: synthesize_media
    writes genuine PNG (filter-cycled scanlines) / WAV payloads with
    closed-form content; decoded_stats round-trips them through the
    stdlib-based decoders (media_codec.py) inside mapInPandas and
    emits exact integer stats. DuckDB cannot decode PNG — it verifies
    the same stats arithmetically from the content formula, so any
    decode bug (filter math, chunk parsing, sample width) breaks the
    hash match."""
    from ..operators.multimodal import decoded_stats, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    return decoded_stats(media)
