"""Data-quality constraint suite — the declarative delivery gate a
training pipeline runs before consuming a snapshot (beyond the
reference, whose ingester trusts its SDK: ref
`ingester/src/executor.rs`).

Each battery compiles to ONE partial-aggregated scan
(operators/quality_checks.validate); referential integrity is a
broadcast left-join probe per (fk, dim) pair. Metrics are exact
integer-count ratios (or DECIMAL-exact means) rounded to 9 decimals
on both engines — hash-stable.
"""

from __future__ import annotations

from functools import reduce

from ..operators import quality_checks as Q
from ..registry import query
from ..schema import load_table

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_PROPS_RE = '^\\{"k": [0-9]+\\}$'
_PRIORITY_RE = "^[1-5]-[A-Z ]+$"

#: oracle row template: one scalar-subquery row per constraint
_ROW = """
    SELECT '{name}' AS "constraint", '{target}' AS target,
           {metric} AS metric,
           {lo} AS lower_bound, {hi} AS upper_bound,
           (({metric}) IS NOT NULL
            AND ({lo} IS NULL OR ({metric}) >= {lo})
            AND ({hi} IS NULL OR ({metric}) <= {hi})) AS passed
    FROM {table}
"""

_NULL_D = "CAST(NULL AS DOUBLE)"


def _row(name, target, metric, lo, hi, table):
    return _ROW.format(
        name=name, target=target, metric=metric,
        lo=_NULL_D if lo is None else repr(float(lo)),
        hi=_NULL_D if hi is None else repr(float(hi)),
        table=table,
    )


def _ratio(num: str, den: str = "COUNT(*)") -> str:
    return (f"round(CASE WHEN {den} > 0 THEN "
            f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) END, 9)")


_EVENTS_ORACLE = " UNION ALL ".join([
    _row("completeness(user_id)", "user_id",
         _ratio("COUNT(user_id)"), 1.0, None, "events"),
    _row("completeness(value)", "value",
         _ratio("COUNT(value)"), 1.0, None, "events"),
    _row("uniqueness(event_id)", "event_id",
         _ratio("COUNT(DISTINCT event_id)"), 1.0, None, "events"),
    _row("uniqueness(user_id)", "user_id",
         _ratio("COUNT(DISTINCT user_id)"), 1.0, None, "events"),
    _row("accepted_values(event_type)", "event_type",
         _ratio("SUM(CASE WHEN event_type IN "
                "('click','error','purchase','signup','view') "
                "THEN 1 ELSE 0 END)", "COUNT(event_type)"),
         1.0, None, "events"),
    _row("in_range(value)", "value",
         _ratio("SUM(CASE WHEN value >= 0.0 AND value <= 1000.0 "
                "THEN 1 ELSE 0 END)", "COUNT(value)"),
         1.0, None, "events"),
    _row("matches_pattern(props)", "props",
         _ratio("SUM(CASE WHEN regexp_matches(props, "
                "'^\\{\"k\": [0-9]+\\}$') THEN 1 ELSE 0 END)",
                "COUNT(props)"),
         0.99, None, "events"),
    _row("mean_between(value)", "value",
         "round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)"
         " / COUNT(value), 9)", 1.0, 500.0, "events"),
    _row("row_count", "*", "CAST(COUNT(*) AS DOUBLE)",
         100.0, None, "events"),
])


@query("dq_events_battery", oracle=_EVENTS_ORACLE)
def dq_events_battery(spark, sf_dir):
    """Nine declared expectations over the event stream — null rates,
    key uniqueness (user_id deliberately NOT a key: its row documents
    a failing constraint's shape), categorical domain, value range,
    props format, mean bound, minimum volume — ALL evaluated in one
    partial-aggregated scan (operators/quality_checks.validate)."""
    events = load_table(spark, sf_dir, "events")
    return Q.validate(events, [
        Q.completeness("user_id"),
        Q.completeness("value"),
        Q.uniqueness("event_id"),
        Q.uniqueness("user_id"),
        Q.accepted_values("event_type", _EVENT_TYPES),
        Q.in_range("value", 0.0, 1000.0),
        Q.matches_pattern("props", _PROPS_RE, min_ratio=0.99),
        Q.mean_between("value", 1.0, 500.0),
        Q.row_count_between(100),
    ])


_ORDERS_ORACLE = " UNION ALL ".join([
    _row("uniqueness(o_orderkey)", "o_orderkey",
         _ratio("COUNT(DISTINCT o_orderkey)"), 1.0, None, "orders"),
    _row("completeness(o_custkey)", "o_custkey",
         _ratio("COUNT(o_custkey)"), 1.0, None, "orders"),
    _row("accepted_values(o_orderstatus)", "o_orderstatus",
         _ratio("SUM(CASE WHEN o_orderstatus IN ('F','O','P') "
                "THEN 1 ELSE 0 END)", "COUNT(o_orderstatus)"),
         1.0, None, "orders"),
    _row("matches_pattern(o_orderpriority)", "o_orderpriority",
         _ratio("SUM(CASE WHEN regexp_matches(o_orderpriority, "
                "'^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END)",
                "COUNT(o_orderpriority)"),
         1.0, None, "orders"),
    _row("in_range(o_totalprice)", "o_totalprice",
         _ratio("SUM(CASE WHEN o_totalprice >= 0.0 AND "
                "o_totalprice <= 600000.0 THEN 1 ELSE 0 END)",
                "COUNT(o_totalprice)"),
         1.0, None, "orders"),
    _row("mean_between(o_totalprice)", "o_totalprice",
         "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS "
         "DOUBLE) / COUNT(o_totalprice), 9)",
         100000.0, 400000.0, "orders"),
])


@query("dq_orders_battery", oracle=_ORDERS_ORACLE)
def dq_orders_battery(spark, sf_dir):
    """Delivery gate on the orders snapshot: key uniqueness, fk
    completeness, status domain, priority format, price range and
    mean — one aggregation pass."""
    orders = load_table(spark, sf_dir, "orders")
    return Q.validate(orders, [
        Q.uniqueness("o_orderkey"),
        Q.completeness("o_custkey"),
        Q.accepted_values("o_orderstatus", ["F", "O", "P"]),
        Q.matches_pattern("o_orderpriority", _PRIORITY_RE),
        Q.in_range("o_totalprice", 0.0, 600000.0),
        Q.mean_between("o_totalprice", 100000.0, 400000.0),
    ])


_REF_ORACLE = " UNION ALL ".join([
    """
    SELECT 'ref_integrity(o_custkey->c_custkey)' AS "constraint",
           'o_custkey' AS target,
           round(CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0
                 END) AS DOUBLE) / COUNT(*), 9) AS metric,
           CAST(NULL AS DOUBLE) AS lower_bound, 0.0 AS upper_bound,
           (round(CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0
                 END) AS DOUBLE) / COUNT(*), 9) <= 0.0) AS passed
    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IS NOT NULL
    """,
    """
    SELECT 'ref_integrity(l_orderkey->o_orderkey)' AS "constraint",
           'l_orderkey' AS target,
           round(CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0
                 END) AS DOUBLE) / COUNT(*), 9) AS metric,
           CAST(NULL AS DOUBLE) AS lower_bound, 0.0 AS upper_bound,
           (round(CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0
                 END) AS DOUBLE) / COUNT(*), 9) <= 0.0) AS passed
    FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey IS NOT NULL
    """,
])


@query("dq_ref_integrity", oracle=_REF_ORACLE)
def dq_ref_integrity(spark, sf_dir):
    """Cross-table key integrity: orders.o_custkey ⊆ customer, and
    lineitem.l_orderkey ⊆ orders. Each probe broadcasts the dim's
    distinct keys onto the fact scan (the fact side never shuffles);
    the two one-row results union into the battery schema."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    probes = [
        Q.ref_integrity(orders, "o_custkey", customer, "c_custkey"),
        Q.ref_integrity(lineitem, "l_orderkey", orders, "o_orderkey"),
    ]
    return reduce(lambda a, b: a.unionByName(b), probes)


_DAILY_ORACLE = " UNION ALL ".join([
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           'completeness(value)' AS "constraint", 'value' AS target,
           round(CAST(COUNT(value) AS DOUBLE) / COUNT(*), 9) AS metric,
           1.0 AS lower_bound, CAST(NULL AS DOUBLE) AS upper_bound,
           (round(CAST(COUNT(value) AS DOUBLE) / COUNT(*), 9) >= 1.0)
             AS passed
    FROM events GROUP BY 1
    """,
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           'mean_between(value)' AS "constraint", 'value' AS target,
           round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(value), 9) AS metric,
           1.0 AS lower_bound, 500.0 AS upper_bound,
           (round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                  / COUNT(value), 9) BETWEEN 1.0 AND 500.0) AS passed
    FROM events GROUP BY 1
    """,
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           'row_count' AS "constraint", '*' AS target,
           CAST(COUNT(*) AS DOUBLE) AS metric,
           1.0 AS lower_bound, CAST(NULL AS DOUBLE) AS upper_bound,
           (CAST(COUNT(*) AS DOUBLE) >= 1.0) AS passed
    FROM events GROUP BY 1
    """,
])


@query("dq_metrics_daily", oracle=_DAILY_ORACLE)
def dq_metrics_daily(spark, sf_dir):
    """The battery grouped by ingest day (`validate(by=)`): a
    quality-metric TIME SERIES from the same single scan — the frame
    a pipeline stores per delivery and sweeps with
    alerts.robust_anomaly_flags to catch slow quality rot that any
    single snapshot's gate would pass."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    daily = events.withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date"))
    return Q.validate(daily, [
        Q.completeness("value"),
        Q.mean_between("value", 1.0, 500.0),
        Q.row_count_between(1),
    ], by=["day"])


@query(
    "dq_freshness_events",
    oracle="""
    SELECT 'freshness(ts)' AS "constraint", 'ts' AS target,
           round((epoch(TIMESTAMP '2024-02-01 00:00:00')
                  - epoch(MAX(ts))) / 3600.0, 9) AS metric,
           CAST(NULL AS DOUBLE) AS lower_bound, 48.0 AS upper_bound,
           (round((epoch(TIMESTAMP '2024-02-01 00:00:00')
                   - epoch(MAX(ts))) / 3600.0, 9) IS NOT NULL
            AND round((epoch(TIMESTAMP '2024-02-01 00:00:00')
                       - epoch(MAX(ts))) / 3600.0, 9) <= 48.0) AS passed
    FROM events
    """,
)
def dq_freshness_events(spark, sf_dir):
    """Delivery freshness: hours between an explicit as-of clock and
    the newest event must stay under 48 — 'did yesterday's delivery
    actually arrive'. The clock is a parameter, never an implicit
    now(): the same battery must return the same verdict on both
    engines (operators/quality_checks.freshness)."""
    events = load_table(spark, sf_dir, "events")
    return Q.validate(events, [
        Q.freshness("ts", 48.0, "2024-02-01 00:00:00"),
    ])


@query(
    "dq_metrics_anomaly",
    oracle=f"""
    WITH series AS ({_DAILY_ORACLE}),
    med AS (
      SELECT "constraint", median(metric) AS med FROM series GROUP BY 1
    ), mad AS (
      SELECT s."constraint", median(abs(s.metric - m.med)) AS mad
      FROM series s JOIN med m USING ("constraint") GROUP BY 1
    )
    SELECT s.day, s."constraint", s.target, s.metric, s.lower_bound,
           s.upper_bound, s.passed,
           m.med AS baseline_median,
           CASE WHEN d.mad > 0
                THEN round((s.metric - m.med) / (1.4826 * d.mad), 9) END
             AS robust_z,
           COALESCE(d.mad > 0 AND
             abs(round((s.metric - m.med) / (1.4826 * d.mad), 9)) > 3.5,
             FALSE) AS is_anomaly
    FROM series s
    JOIN med m USING ("constraint")
    JOIN mad d USING ("constraint")
    """,
)
def dq_metrics_anomaly(spark, sf_dir):
    """Slow-rot sweep COMPOSED: the per-day battery series swept with
    the Hampel detector, each constraint against its own median/MAD
    baseline — the query a pipeline schedules to catch quality decay
    that every single snapshot's gate passes. Both halves are
    individually oracled; this checks the composition."""
    from pyspark.sql import functions as F

    from ..operators.alerts import robust_anomaly_flags

    events = load_table(spark, sf_dir, "events")
    daily = events.withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date"))
    series = Q.validate(daily, [
        Q.completeness("value"),
        Q.mean_between("value", 1.0, 500.0),
        Q.row_count_between(1),
    ], by=["day"])
    return robust_anomaly_flags(series, "metric", threshold=3.5,
                                by=("constraint",))


_DOCS_ORACLE = " UNION ALL ".join([
    _row("completeness(text)", "text",
         _ratio("COUNT(text)"), 1.0, None, "documents"),
    _row("uniqueness(doc_id)", "doc_id",
         _ratio("COUNT(DISTINCT doc_id)"), 1.0, None, "documents"),
    _row("accepted_values(lang)", "lang",
         _ratio("SUM(CASE WHEN lang IN ('de','en','es','fr','zh') "
                "THEN 1 ELSE 0 END)", "COUNT(lang)"),
         1.0, None, "documents"),
    _row("matches_pattern(source)", "source",
         _ratio("SUM(CASE WHEN regexp_matches(source, "
                "'^src[0-9]+$') THEN 1 ELSE 0 END)",
                "COUNT(source)"),
         1.0, None, "documents"),
    _row("in_range(n_chars)", "n_chars",
         _ratio("SUM(CASE WHEN n_chars >= 1.0 AND n_chars <= 10000.0 "
                "THEN 1 ELSE 0 END)", "COUNT(n_chars)"),
         1.0, None, "documents"),
    _row("mean_between(n_chars)", "n_chars",
         "round(CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE)"
         " / COUNT(n_chars), 9)", 10.0, 2000.0, "documents"),
    _row("row_count", "*", "CAST(COUNT(*) AS DOUBLE)",
         100.0, None, "documents"),
])


@query("dq_documents_battery", oracle=_DOCS_ORACLE)
def dq_documents_battery(spark, sf_dir):
    """The delivery gate a training pipeline runs on a document
    snapshot before spending GPU-time on it: text present, stable
    doc ids, language/source domains, sane length stats — seven
    constraints in the same ONE partial-aggregated scan as the
    events/orders batteries."""
    docs = load_table(spark, sf_dir, "documents")
    return Q.validate(docs, [
        Q.completeness("text"),
        Q.uniqueness("doc_id"),
        Q.accepted_values("lang", ["de", "en", "es", "fr", "zh"]),
        Q.matches_pattern("source", "^src[0-9]+$"),
        Q.in_range("n_chars", 1.0, 10000.0),
        Q.mean_between("n_chars", 10.0, 2000.0),
        Q.row_count_between(100),
    ])
