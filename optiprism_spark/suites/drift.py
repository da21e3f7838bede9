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


# ---------------------------------------------------------------- r12:
# fixed-edge + rollup-routed drift (the recurring-delivery shape: DDL
# edges keep bins comparable across runs; the routed variant folds the
# day-grain store's histogram bins instead of rescanning raw events)

_FIX_EDGES = (1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0)
_JAN = ("2024-01-01 00:00:00", "2024-01-31 23:59:59.999999")


def _fixed_psi_oracle() -> str:
    """Mirror of distribution_drift_fixed: one row of per-bin
    conditional sums over the January population, unpivoted to ALL
    bins (empty ones contribute exactly 0.0), PSI smoothed per bin."""
    n_bins = len(_FIX_EDGES) + 1
    sums = []
    for i in range(n_bins):
        if i == 0:
            cond = f"v < {_FIX_EDGES[0]}"
        elif i == n_bins - 1:
            cond = f"v >= {_FIX_EDGES[-1]}"
        else:
            cond = f"v >= {_FIX_EDGES[i - 1]} AND v < {_FIX_EDGES[i]}"
        sums.append(f"CAST(SUM(CASE WHEN {cond} AND exp_side THEN 1 "
                    f"ELSE 0 END) AS BIGINT) AS e{i}")
        sums.append(f"CAST(SUM(CASE WHEN {cond} AND NOT exp_side THEN 1 "
                    f"ELSE 0 END) AS BIGINT) AS a{i}")
    te = " + ".join(f"e{i}" for i in range(n_bins))
    ta = " + ".join(f"a{i}" for i in range(n_bins))
    cells = ", ".join(f"({i})" for i in range(n_bins))
    e_arm = " ".join(f"WHEN {i} THEN e{i}" for i in range(n_bins))
    a_arm = " ".join(f"WHEN {i} THEN a{i}" for i in range(n_bins))
    return f"""
    WITH pop AS (
      SELECT value AS v, ts < TIMESTAMP '{_SPLIT_TS}' AS exp_side
      FROM events
      WHERE value IS NOT NULL
        AND ts BETWEEN TIMESTAMP '{_JAN[0]}' AND TIMESTAMP '{_JAN[1]}'
    ), sums AS (
      SELECT {", ".join(sums)}, CAST({te} AS BIGINT) AS te,
             CAST({ta} AS BIGINT) AS ta
      FROM pop
    ), cells AS (SELECT * FROM (VALUES {cells}) AS t(bucket))
    SELECT CAST(bucket AS INT) AS bucket,
           (CASE bucket {e_arm} END) AS n_expected,
           (CASE bucket {a_arm} END) AS n_actual,
           round(
               (((CASE bucket {e_arm} END) + 0.5) / (te + 0.5 * {n_bins})
                - ((CASE bucket {a_arm} END) + 0.5) / (ta + 0.5 * {n_bins}))
               * ln((((CASE bucket {e_arm} END) + 0.5) / (te + 0.5 * {n_bins}))
                    / (((CASE bucket {a_arm} END) + 0.5) / (ta + 0.5 * {n_bins}))),
               9) AS psi_contrib
    FROM sums, cells
    """


@query("drift_psi_value_fixed_bins", oracle=_fixed_psi_oracle())
def drift_psi_value_fixed_bins(spark, sf_dir):
    """PSI over DDL-time bin edges (first vs second half of January).
    Fixed edges are what a recurring delivery check needs — global
    min/max bins re-cut themselves whenever an outlier lands, making
    week-over-week PSIs incomparable. Window-free plan: ONE
    partial-aggregated scan into a single row of conditional sums,
    unpivoted via stack (operators/drift.distribution_drift_fixed)."""
    import datetime as _dt

    from ..dsl import QueryTime
    from ..exprs import full_filter
    from ..operators.drift import distribution_drift_fixed

    time = QueryTime.between(
        _dt.datetime(2024, 1, 1),
        _dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
    events = load_table(spark, sf_dir, "events").filter(full_filter(time))
    return distribution_drift_fixed(
        events, "value",
        split=F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"),
        edges=_FIX_EDGES,
    )


#: persisted day-grain store with histogram bins, built once per
#: (process, sf_dir) — the routed drift query reads THIS parquet (the
#: materialized-view read path a recurring delivery check hits), not
#: an in-memory pre-aggregation whose lineage still reaches raw events
_HIST_STORES: dict[str, object] = {}


def _hist_store(spark, sf_dir: str):
    from ..rollup import RollupSpec, RollupStore

    st = _HIST_STORES.get(sf_dir)
    if st is None:
        import atexit
        import os
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="optiprism_drift_store_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        st = RollupStore(
            os.path.join(d, "rollup"),
            RollupSpec(histogram_props=(("value", _FIX_EDGES),)))
        st.rebuild(spark, load_table(spark, sf_dir, "events"))
        _HIST_STORES[sf_dir] = st
    return st


@query("drift_psi_value_rollup_routed", oracle=_fixed_psi_oracle())
def drift_psi_value_rollup_routed(spark, sf_dir):
    """The SAME fixed-edge PSI folded from the day-grain rollup's
    STORED histogram bins (rollup.psi_from_rollup) — zero raw-event
    rescans for the recurring snapshot check; the fold touches
    ~bins × days pre-aggregated rows read from the persisted store.
    Hash-matching the raw-scan oracle IS the routed ≡ raw proof the
    serving plane relies on."""
    import datetime as _dt

    from ..dsl import QueryTime
    from ..rollup import psi_from_rollup

    st = _hist_store(spark, sf_dir)
    base = QueryTime.between(
        _dt.datetime(2024, 1, 1),
        _dt.datetime(2024, 1, 15, 23, 59, 59, 999999))
    actual = QueryTime.between(
        _dt.datetime(2024, 1, 16),
        _dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
    return psi_from_rollup(st.read(spark), st.spec, "value", base, actual)


def _topk_mix_oracle(k: int) -> str:
    """Mirror of categorical_psi_tail's top-K guard: rank categories
    by total desc (ties by category asc), fold the tail into
    __other__, then the shared smoothed-PSI formula over ≤ K+1 rows."""
    return f"""
    WITH vals AS (
      SELECT event_type AS category,
             ts < TIMESTAMP '{_SPLIT_TS}' AS exp_side
      FROM events
      WHERE event_type IS NOT NULL
        AND ts BETWEEN TIMESTAMP '{_JAN[0]}' AND TIMESTAMP '{_JAN[1]}'
    ), hist AS (
      SELECT category,
             CAST(SUM(CASE WHEN exp_side THEN 1 ELSE 0 END) AS BIGINT) AS n_expected,
             CAST(SUM(CASE WHEN exp_side THEN 0 ELSE 1 END) AS BIGINT) AS n_actual
      FROM vals GROUP BY 1
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY n_expected + n_actual DESC, category ASC) AS rnk
      FROM hist
    ), guarded AS (
      SELECT category, n_expected, n_actual FROM ranked WHERE rnk <= {k}
      UNION ALL
      SELECT '__other__', CAST(SUM(n_expected) AS BIGINT),
             CAST(SUM(n_actual) AS BIGINT)
      FROM ranked WHERE rnk > {k} HAVING COUNT(*) > 0
    )
    SELECT category, n_expected, n_actual,
           round(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * COUNT(*) OVER ())
                  - (n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * COUNT(*) OVER ()))
                 * ln(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * COUNT(*) OVER ()))
                      / ((n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * COUNT(*) OVER ()))),
                 9) AS psi_contrib
    FROM guarded
    """


@query("drift_psi_event_mix_topk", oracle=_topk_mix_oracle(2))
def drift_psi_event_mix_topk(spark, sf_dir):
    """Categorical PSI with the cardinality guard EXERCISED (top-2 of
    the event-type mix + __other__): the shape that makes the operator
    safe on URL/user-agent-grade columns — the histogram, broadcast,
    and final window are all bounded by K, and the index stays
    well-defined because the tail keeps its mass in one bucket."""
    import datetime as _dt

    from ..dsl import QueryTime
    from ..exprs import full_filter
    from ..operators.drift import categorical_drift

    time = QueryTime.between(
        _dt.datetime(2024, 1, 1),
        _dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
    events = load_table(spark, sf_dir, "events").filter(full_filter(time))
    return categorical_drift(
        events, "event_type",
        split=F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"),
        max_categories=2,
    )


def _quantile_psi_oracle(n_bins: int) -> str:
    """Mirror of distribution_drift_quantile: baseline quantile edges
    (rounded to 9 on both engines), bucket = 1 + Σ(v >= edge), the
    shared smoothed-PSI tail over occupied buckets."""
    qcols = ", ".join(
        f"round(quantile_cont(v, {i / n_bins!r}) FILTER (exp_side), 9)"
        f" AS q{i}"
        for i in range(1, n_bins))
    bump = " + ".join(
        f"CAST(v >= q{i} AS INT)" for i in range(1, n_bins))
    return f"""
    WITH pop AS (
      SELECT value AS v, ts < TIMESTAMP '{_SPLIT_TS}' AS exp_side
      FROM events
      WHERE value IS NOT NULL
        AND ts BETWEEN TIMESTAMP '{_JAN[0]}' AND TIMESTAMP '{_JAN[1]}'
    ), q AS (SELECT {qcols} FROM pop),
    binned AS (
      SELECT CAST(1 + {bump} AS INT) AS bucket, exp_side FROM pop, q
    ), hist AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN exp_side THEN 1 ELSE 0 END) AS BIGINT) AS n_expected,
             CAST(SUM(CASE WHEN exp_side THEN 0 ELSE 1 END) AS BIGINT) AS n_actual
      FROM binned GROUP BY 1
    )
    SELECT bucket, n_expected, n_actual,
           round(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * {n_bins})
                  - (n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * {n_bins}))
                 * ln(((n_expected + 0.5) / (SUM(n_expected) OVER () + 0.5 * {n_bins}))
                      / ((n_actual + 0.5) / (SUM(n_actual) OVER () + 0.5 * {n_bins}))),
                 9) AS psi_contrib
    FROM hist
    """


@query("drift_psi_value_quantile_bins", oracle=_quantile_psi_oracle(10))
def drift_psi_value_quantile_bins(spark, sf_dir):
    """PSI over EQUI-DEPTH bins (baseline-decile edges), first vs
    second half of January — the production PSI binning: every bin
    carries ~10% of the baseline mass, so tail shifts register
    instead of vanishing into two overstuffed middle bins, and edges
    move only when the baseline is re-chosen (not when one outlier
    lands, unlike global-min/max bins). One baseline percentile
    aggregate broadcast onto the scan
    (operators/drift.distribution_drift_quantile)."""
    import datetime as _dt

    from ..dsl import QueryTime
    from ..exprs import full_filter
    from ..operators.drift import distribution_drift_quantile

    time = QueryTime.between(
        _dt.datetime(2024, 1, 1),
        _dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
    events = load_table(spark, sf_dir, "events").filter(full_filter(time))
    return distribution_drift_quantile(
        events, "value",
        split=F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"),
        n_bins=10,
    )


def _centroid_oracle(dim: int = 64) -> str:
    """Mirror of operators/drift.embedding_centroid_drift: round-7
    decimal component sums (exact, order-free), then the SAME
    left-to-right 64-term expression folds in doubles, round-9."""
    sums = ",\n             ".join(
        f"SUM(CAST(round(CAST(embedding[{i + 1}] AS DOUBLE), 7)"
        f" AS DECIMAL(28,7))) AS s{i}"
        for i in range(dim)
    )
    rm = [f"(CAST(r.s{i} AS DOUBLE) / CAST(r.n AS DOUBLE))" for i in range(dim)]
    cm = [f"(CAST(c.s{i} AS DOUBLE) / CAST(c.n AS DOUBLE))" for i in range(dim)]
    dot = " + ".join(f"{rm[i]} * {cm[i]}" for i in range(dim))
    nr = " + ".join(f"{rm[i]} * {rm[i]}" for i in range(dim))
    nc = " + ".join(f"{cm[i]} * {cm[i]}" for i in range(dim))
    l2 = " + ".join(f"({rm[i]} - {cm[i]}) * ({rm[i]} - {cm[i]})"
                    for i in range(dim))
    return f"""
    WITH h AS (
      SELECT label, (vec_id % 2 = 1) AS cur, COUNT(*) AS n,
             {sums}
      FROM embeddings GROUP BY 1, 2
    ), r AS (SELECT * FROM h WHERE NOT cur),
    c AS (SELECT * FROM h WHERE cur)
    SELECT r.label AS label, r.n AS n_ref, c.n AS n_cur,
           round(({dot}) / sqrt(({nr}) * ({nc})), 9) AS centroid_cosine,
           round(sqrt({l2}), 9) AS centroid_l2
    FROM r JOIN c ON r.label = c.label
    """


@query("drift_embedding_centroid_by_label", oracle=_centroid_oracle())
def drift_embedding_centroid_by_label(spark, sf_dir):
    """Embedding-space drift per label between two deterministic
    halves (even/odd ids standing in for consecutive snapshots):
    centroid cosine + L2 shift. One map-side-combinable groupBy
    carrying 64 exact decimal sums per (label, half) — no explode,
    no UDF; the pairing is a broadcast join of a 20-row frame."""
    from pyspark.sql import functions as F

    from ..operators.drift import embedding_centroid_drift

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_centroid_drift(
        emb, current=(F.col("vec_id") % 2 == 1), by="label")
