"""Local differential-oracle harness.

Approximates the driver's correctness gate: run a registered Spark
query and its DuckDB oracle SQL on the same parquet, then compare
row-count + column names + values order-insensitively and EXACTLY
(the engine's decimal-based arithmetic is designed to make even
float-valued aggregates bit-identical across engines).

This is the same differential-testing strategy the reference uses
against ClickHouse (reference tests/queries/*.py, SURVEY §5).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from optiprism_spark.schema import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # dates, Decimals, strings → canonical string
            df[c] = s.map(lambda v: None if v is None else str(v))
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != oracle {sorted(oracle_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            aa, ba = av.to_numpy(), bv.to_numpy()
            both_nan = np.isnan(aa) & np.isnan(ba)
            eq = (aa == ba) | both_nan
            if not eq.all():
                i = int(np.argmin(eq))
                diff = np.nanmax(np.abs(aa - ba))
                raise AssertionError(
                    f"{name}: column {c} mismatch at sorted-row {i}: "
                    f"{aa[i]!r} != {ba[i]!r} (max abs diff {diff:.3e})"
                )
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                raise AssertionError(
                    f"{name}: column {c} mismatch at sorted-row {i}: "
                    f"{av.iloc[i]!r} != {bv.iloc[i]!r}"
                )


def check_query(spark, name: str, sf_dir: str) -> None:
    from optiprism_spark.registry import ORACLE_SQL, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLE_SQL:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    oracle_pdf = run_oracle(ORACLE_SQL[name], sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, name)
