"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least defaultParallelism partitions before a
    CPU-heavy projection.

    Row-count-based file splitting gives few partitions for small-but-
    expensive inputs (e.g. 5k docs in one parquet file → 1 partition →
    md5-per-shingle work runs on one core). At scale the scan is
    already parallel and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
