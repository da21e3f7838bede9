"""Operator-level unit tests for reshape — inline fixtures, mirroring
the reference's markdown-table operator tests (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from optiprism_spark.operators.reshape import (
    add_average_and_sort,
    add_string_column,
    limit_groups,
    merge_frames,
    pivot_buckets,
    rename_column_rows,
    rename_columns,
    reorder_columns,
    unpivot_metrics,
)


def test_merge_frames_schema_merge_and_discriminator(spark):
    a = spark.createDataFrame([(1, 10)], "bucket int, n int")
    b = spark.createDataFrame([(2, 5.0)], "bucket int, sum_v double")
    out = merge_frames([a, b], names=["e1", "e2"]).toPandas()
    assert sorted(out.columns) == ["bucket", "event", "n", "sum_v"]
    assert len(out) == 2
    e2 = out[out.event == "e2"].iloc[0]
    assert e2.sum_v == 5.0 and e2.n != e2.n  # n is NaN for the merged-in frame


def test_unpivot_then_pivot_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", 1, 2.0), ("b", 3, 4.0)], "k string, m1 int, m2 double"
    )
    melted = unpivot_metrics(df, ["k"], ["m1", "m2"])
    assert melted.columns == ["k", "agg_name", "value"]
    assert melted.count() == 4
    wide = pivot_buckets(melted, ["agg_name"], "k", ["a", "b", "c"])
    pdf = wide.toPandas().set_index("agg_name")
    assert float(pdf.loc["m1", "a"]) == 1.0
    assert float(pdf.loc["m2", "b"]) == 4.0
    assert float(pdf.loc["m1", "c"]) == 0.0  # null→0 fill for missing bucket


def test_average_and_limit_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 3.0), ("b", 10.0, 20.0), ("c", 2.0, 4.0)],
        "k string, c1 double, c2 double",
    )
    avg = add_average_and_sort(df, ["c1", "c2"])
    rows = avg.collect()
    assert [r.k for r in rows] == ["b", "c", "a"]
    assert rows[0].Average == 15.0
    top2 = limit_groups(avg, ["k"], 2, order_col="Average").toPandas()
    assert sorted(top2.k) == ["b", "c"]


def test_renames_and_reorder(spark):
    df = spark.createDataFrame([("0_0_count", 1)], "agg string, v int")
    out = rename_column_rows(df, "agg", {"0_0_count": "Count"})
    assert out.collect()[0].agg == "Count"
    out2 = rename_columns(df, {"v": "value"})
    assert "value" in out2.columns
    out3 = reorder_columns(df, ["v"])
    assert out3.columns == ["v", "agg"]
    out4 = add_string_column(df, "event", "Buy")
    assert out4.columns[0] == "event"
    assert out4.collect()[0].event == "Buy"
