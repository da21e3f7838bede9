"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least defaultParallelism partitions before a
    CPU-heavy projection.

    Row-count-based file splitting gives few partitions for small-but-
    expensive inputs (e.g. 5k docs in one parquet file → 1 partition →
    md5-per-shingle work runs on one core). At scale the scan is
    already parallel and this is a no-op.

    The parallelism probe uses inputFiles() — plan metadata only — not
    df.rdd.getNumPartitions(), which would convert the plan to an RDD
    just to inspect it. A many-file scan is already parallel; few/no
    files (small table, in-memory test frame) get the repartition."""
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
