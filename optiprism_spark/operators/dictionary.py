"""Dictionary encode/decode — broadcast-map lookups.

The reference stores dictionary-encoded string columns (int keys) and
decodes them to strings only at result time via RocksDB lookups
(metadata/src/dictionaries.rs:40,121-145, physical decode
query/src/physical_plan/dictionary_decode.rs:46-240). A Spark build
keeps plain strings — parquet dictionary-encodes them on disk anyway —
but the *operators* are still useful (late materialization of wide
label columns, compact shuffle keys), so they exist here as
first-class broadcast joins:

- ``build_dictionary``: distinct values → dense 1-based keys, ordered
  by value (deterministic across engines/partitionings).
- ``dict_encode`` / ``dict_decode``: broadcast hash joins swapping the
  column for its key (or back). The fact side never shuffles.

At 100 TB the dictionary frame is small by construction (distinct
labels) and broadcasts; encoding before a wide shuffle shrinks the
shuffle payload, decoding after the aggregate touches only result
rows — the same late-materialization the reference implements with
its DictionaryDecodeExec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dictionary(df: DataFrame, col: str) -> DataFrame:
    """(key BIGINT, value STRING): dense keys assigned in value order
    — equals SQL ``dense_rank() OVER (ORDER BY value)`` on distinct
    values, so any engine rebuilds the identical mapping."""
    w = Window.orderBy(F.col("value"))
    return (
        df.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .withColumn("key", F.dense_rank().over(w).cast("long"))
        .select("key", "value")
    )


def dict_encode(
    df: DataFrame, col: str, dictionary: DataFrame, key_col: str = None
) -> DataFrame:
    """Replace string column `col` with its int key (broadcast join;
    unseen/null values encode as null, matching the reference's
    missing-key semantics)."""
    key_col = key_col or f"{col}_key"
    dim = dictionary.select(
        F.col("value").alias(col), F.col("key").alias(key_col)
    )
    return df.join(F.broadcast(dim), col, "left").drop(col)


def dict_decode(
    df: DataFrame, key_col: str, dictionary: DataFrame, out_col: str = None,
    keep_key: bool = False,
) -> DataFrame:
    """Int key → string value (the late-materialization decode)."""
    out_col = out_col or key_col.removesuffix("_key")
    dim = dictionary.select(
        F.col("key").alias(key_col), F.col("value").alias(out_col)
    )
    out = df.join(F.broadcast(dim), key_col, "left")
    return out if keep_key else out.drop(key_col)
