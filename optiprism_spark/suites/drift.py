"""Data-quality / drift suite — snapshot validation for a training
pipeline (beyond the reference, which trusts its SDK at ingest).

Float determinism: means go through DECIMAL(28,6) exact sums
(suites/_sql recipe); the PSI's ln() is rounded to 9 decimals on both
engines (the win_logarithmic precedent). The bin expression is plain
double arithmetic written token-identically in both dialects.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.drift import distribution_drift, table_profile
from ..registry import query
from ..schema import load_table
from . import _sql as S

_SPLIT_TS = "2024-01-16 00:00:00"
_BINS = 10


@query(
    "drift_profile_value_by_type",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
           round({S.avg_exact('value')}, 9) AS value_mean,
           MIN(value) AS value_min,
           MAX(value) AS value_max,
           COUNT(DISTINCT value) AS value_distinct
    FROM events GROUP BY 1
    """,
)
def drift_profile_value_by_type(spark, sf_dir):
    """Per-event-type profile of the value column — the snapshot
    contract a pipeline asserts before training on a delivery (row
    volumes, null rates, moment + range of every numeric column), in
    ONE partial-aggregated scan (operators/drift.table_profile)."""
    events = load_table(spark, sf_dir, "events")
    return table_profile(events, ["value"], by=["event_type"])


@query(
    "drift_psi_value_half_month",
    oracle=f"""
    WITH vals AS (
      SELECT value AS v,
             ts < TIMESTAMP '{_SPLIT_TS}' AS exp_side
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ), bounds AS (
      SELECT MIN(v) AS lo, MAX(v) AS hi FROM vals
    ), binned AS (
      SELECT CASE WHEN v >= hi THEN {_BINS}
                  ELSE CAST(FLOOR((v - lo) / (hi - lo) * {_BINS}) AS INT) + 1
             END AS bucket,
             exp_side
      FROM vals, bounds
    ), hist AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN exp_side THEN 1 ELSE 0 END) AS BIGINT) AS n_expected,
             CAST(SUM(CASE WHEN exp_side THEN 0 ELSE 1 END) AS BIGINT) AS n_actual
      FROM binned GROUP BY 1
    )
    SELECT bucket, n_expected, n_actual,
           round(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * {_BINS})
                  - (n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * {_BINS}))
                 * ln(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * {_BINS}))
                      / ((n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * {_BINS}))),
                 9) AS psi_contrib
    FROM hist
    """,
)
def drift_psi_value_half_month(spark, sf_dir):
    """Population Stability Index of the value distribution, first
    half of January vs second half — the distribution-shift alarm a
    pipeline runs between snapshot deliveries. Per-bin contributions
    (sum = PSI) keep the diagnosis local; bins are aligned via one
    global bounds aggregate broadcast onto the scan
    (operators/drift.distribution_drift)."""
    events = load_table(spark, sf_dir, "events")
    return distribution_drift(
        events, "value",
        split=F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"),
        bins=_BINS,
    )


@query(
    "drift_psi_event_mix_half_month",
    oracle=f"""
    WITH vals AS (
      SELECT event_type AS category,
             ts < TIMESTAMP '{_SPLIT_TS}' AS exp_side
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ), hist AS (
      SELECT category,
             CAST(SUM(CASE WHEN exp_side THEN 1 ELSE 0 END) AS BIGINT) AS n_expected,
             CAST(SUM(CASE WHEN exp_side THEN 0 ELSE 1 END) AS BIGINT) AS n_actual
      FROM vals GROUP BY 1
    )
    SELECT category, n_expected, n_actual,
           round(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * COUNT(*) OVER ())
                  - (n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * COUNT(*) OVER ()))
                 * ln(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * COUNT(*) OVER ()))
                      / ((n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * COUNT(*) OVER ()))),
                 9) AS psi_contrib
    FROM hist
    """,
)
def drift_psi_event_mix_half_month(spark, sf_dir):
    """Categorical PSI of the event-type mix, first vs second half of
    January — catches instrumentation drift (an SDK release dropping
    an event type) that numeric profiles miss. One partial-aggregated
    scan; the PSI window runs over n_categories rows
    (operators/drift.categorical_drift)."""
    from ..operators.drift import categorical_drift

    events = load_table(spark, sf_dir, "events")
    return categorical_drift(
        events, "event_type",
        split=F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"))
