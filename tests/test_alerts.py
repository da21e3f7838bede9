"""Anomaly-flag semantics pinned on hand-computed series
(operators/alerts.py; the oracle suite checks engine≡DuckDB)."""

from __future__ import annotations

import pytest

def test_anomaly_flags_hand_computed(spark):
    """Trailing-window z-scores on a hand-computed series: a flat
    baseline then a spike; the spike is flagged, the current bucket
    never pollutes its own baseline, warm-up rows stay NULL."""
    import datetime as dt

    from optiprism_spark.operators.alerts import anomaly_flags

    rows = [
        (dt.date(2024, 1, d), n)
        for d, n in [(1, 10), (2, 12), (3, 11), (4, 9), (5, 30), (6, 11)]
    ]
    series = spark.createDataFrame(rows, "bucket date, n long")
    out = {r["bucket"].day: r for r in
           anomaly_flags(series, "n", window=7, z_threshold=3.0,
                         min_periods=3).collect()}
    # warm-up: days 1-3 have < 3 trailing points
    assert out[1]["z_score"] is None and not out[1]["is_anomaly"]
    assert out[3]["z_score"] is None
    # day 5: baseline (10,12,11,9) mean 10.5, var ((446-42^2/4)/3)=5/3
    import math

    z5 = (30 - 10.5) / math.sqrt(5 / 3)
    assert out[5]["z_score"] == pytest.approx(z5)
    assert out[5]["is_anomaly"]
    # day 6 is ordinary — its baseline now CONTAINS the spike, which
    # inflates the variance and protects against post-spike flapping
    assert not out[6]["is_anomaly"]
    # flags are the only Trues
    assert [d for d, r in out.items() if r["is_anomaly"]] == [5]


def test_anomaly_flags_calendar_gap_shrinks_baseline(spark):
    """A missing calendar day shrinks the trailing RANGE window
    instead of sliding it — day indexes, not row offsets."""
    import datetime as dt

    from optiprism_spark.operators.alerts import anomaly_flags

    rows = [(dt.date(2024, 1, d), 10) for d in (1, 2, 3)] + [
        (dt.date(2024, 1, 20), 10),  # far gap: no trailing points
    ]
    series = spark.createDataFrame(rows, "bucket date, n long")
    out = {r["bucket"].day: r for r in
           anomaly_flags(series, "n", window=7).collect()}
    assert out[20]["z_score"] is None and not out[20]["is_anomaly"]
