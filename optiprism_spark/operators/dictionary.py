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
    values, so any engine rebuilds the identical mapping.

    Two-phase ranking: a global un-partitioned window would funnel
    every distinct value through one task. Instead the values are
    RANGE-partitioned (partition p's values all sort before partition
    p+1's), ranked locally per partition, and shifted by the earlier
    partitions' cumulative counts. The offsets frame is one row per
    partition — its window is trivially small — so no task ever sees
    more than its value range, and the assigned keys are identical for
    any partition count."""
    vals = (
        df.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    n_part = df.sparkSession.sparkContext.defaultParallelism
    ranged = vals.repartitionByRange(n_part, F.col("value")).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "__lrk",
        F.row_number().over(Window.partitionBy("__pid").orderBy(F.col("value"))),
    )
    offsets = (
        local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    # over n_partitions rows; constant partition key
                    # only quiets the benign WindowExec warning
                    Window.partitionBy(F.lit(0)).orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .select((F.col("__lrk") + F.col("__off")).cast("long").alias("key"), "value")
    )


def persisted_dictionary(
    catalog,
    project_id: int,
    table: str,
    col: str,
    df: DataFrame = None,
    spark=None,
) -> DataFrame:
    """Catalog-backed dictionary for (project, table, column) — the
    persisted variant of ``build_dictionary`` (reference
    metadata/src/dictionaries.rs:121-145): keys live in the metadata
    store, so encode/decode is STABLE ACROSS RUNS instead of derived
    per query. If ``df`` is given, its unseen distinct values are
    first registered (append-only: existing values keep their keys
    forever, new ones take the next keys from the per-column
    sequence). Returns the (key, value) mapping frame for
    ``dict_encode`` / ``dict_decode``.

    Scale note: only the DISTINCT label set crosses the driver — a
    dictionary column is small by construction (that is what makes it
    dictionary-encodable; the reference holds the same map in
    RocksDB). The fact table never moves.
    """
    spark = spark or (df.sparkSession if df is not None else None)
    if spark is None:
        raise ValueError("persisted_dictionary needs df or spark")
    if df is not None:
        vals = [
            r[0] for r in
            df.select(F.col(col)).filter(F.col(col).isNotNull())
            .distinct().collect()
        ]
        mapping = catalog.dict_register_values(project_id, table, col, vals)
    else:
        mapping = dict(
            (v, k) for k, v in catalog.dict_entries_for(project_id, table, col)
        )
    return spark.createDataFrame(
        [(int(k), v) for v, k in sorted(mapping.items())], "key long, value string"
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
