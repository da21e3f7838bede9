"""Differential fuzz over the data-quality constraint space.

Random batteries (constraint kinds × columns × thresholds × optional
time window × optional per-day grouping) run through
operators/quality_checks.validate and compare against independently
emitted DuckDB SQL — the combinatorial analogue of the enumerated
dq_* suite queries. Mirrors the protocol of the other _fuzz modules:
gen_spec / run_spec / spec_to_sql.
"""

from __future__ import annotations

import random

_TYPES = ["click", "error", "purchase", "signup", "view"]
#: anchored, common Java-regex/RE2 subset (the PII-pattern rule)
_REGEXES = [
    ('^\\{"k": [0-9]+\\}$', "props"),
    ('^\\{"k": 1[0-9]*\\}$', "props"),
    ("^[a-z]+$", "event_type"),
    ("^(view|click)$", "event_type"),
]
_RATIOS = [0.0, 0.25, 0.5, 0.9, 1.0]
#: whole-day bounds inside the Jan-2024 corpus, string-cast on both
#: engines (the TZ-safe literal rule)
_DAYS = [f"2024-01-{d:02d}" for d in range(1, 29)]


def gen_spec(seed: int) -> dict:
    rng = random.Random(seed)
    cons = []
    for _ in range(rng.randint(2, 6)):
        kind = rng.choice([
            "completeness", "uniqueness", "in_range", "non_negative",
            "accepted_values", "matches_pattern", "mean_between",
            "row_count", "freshness",
        ])
        if kind == "completeness":
            cons.append({"kind": kind,
                         "col": rng.choice(["user_id", "value",
                                            "event_type", "props"]),
                         "lo": rng.choice(_RATIOS)})
        elif kind == "uniqueness":
            cons.append({"kind": kind,
                         "col": rng.choice(["event_id", "user_id",
                                            "event_type"]),
                         "lo": rng.choice(_RATIOS)})
        elif kind == "in_range":
            lo = rng.choice([-50.0, 0.0, 1.0, 10.0, 100.0])
            cons.append({"kind": kind, "col": "value", "range_lo": lo,
                         "range_hi": lo + rng.choice([5.0, 50.0, 600.0]),
                         "lo": rng.choice(_RATIOS)})
        elif kind == "non_negative":
            cons.append({"kind": kind, "col": "value",
                         "lo": rng.choice(_RATIOS)})
        elif kind == "accepted_values":
            k = rng.randint(1, 5)
            cons.append({"kind": kind, "col": "event_type",
                         "values": sorted(rng.sample(_TYPES, k)),
                         "lo": rng.choice(_RATIOS)})
        elif kind == "matches_pattern":
            rx, col = rng.choice(_REGEXES)
            cons.append({"kind": kind, "col": col, "regex": rx,
                         "lo": rng.choice(_RATIOS)})
        elif kind == "mean_between":
            lo = rng.choice([0.0, 10.0, 40.0, 100.0])
            cons.append({"kind": kind, "col": "value", "range_lo": lo,
                         "range_hi": lo + rng.choice([10.0, 60.0, 500.0])})
        elif kind == "row_count":
            lo = rng.choice([1, 100, 10_000, 1_000_000])
            hi = rng.choice([None, lo * 10])
            cons.append({"kind": kind, "count_lo": lo, "count_hi": hi})
        else:
            cons.append({"kind": "freshness", "col": "ts",
                         "as_of": rng.choice(["2024-02-01 00:00:00",
                                              "2024-01-20 12:00:00",
                                              "2024-03-15 06:30:00"]),
                         "max_age": rng.choice([1.0, 48.0, 1000.0])})
    spec = {"constraints": cons, "by_day": rng.random() < 0.3}
    if rng.random() < 0.5:
        d0, d1 = sorted(rng.sample(_DAYS, 2))
        spec["time"] = (f"{d0} 00:00:00", f"{d1} 23:59:59")
    return spec


def _build(spec):
    from optiprism_spark.operators import quality_checks as Q

    built = []
    for c in spec["constraints"]:
        k = c["kind"]
        if k == "completeness":
            built.append(Q.completeness(c["col"], c["lo"]))
        elif k == "uniqueness":
            built.append(Q.uniqueness(c["col"], c["lo"]))
        elif k == "in_range":
            built.append(Q.in_range(c["col"], c["range_lo"],
                                    c["range_hi"], c["lo"]))
        elif k == "non_negative":
            built.append(Q.non_negative(c["col"], c["lo"]))
        elif k == "accepted_values":
            built.append(Q.accepted_values(c["col"], c["values"], c["lo"]))
        elif k == "matches_pattern":
            built.append(Q.matches_pattern(c["col"], c["regex"], c["lo"]))
        elif k == "mean_between":
            built.append(Q.mean_between(c["col"], c["range_lo"],
                                        c["range_hi"]))
        elif k == "row_count":
            built.append(Q.row_count_between(c["count_lo"], c["count_hi"]))
        else:
            built.append(Q.freshness(c["col"], c["max_age"], c["as_of"]))
    return built


def run_spec(spark, sf_dir: str, spec: dict):
    from pyspark.sql import functions as F

    from optiprism_spark.schema import load_table

    events = load_table(spark, sf_dir, "events")
    if "time" in spec:
        t0, t1 = spec["time"]
        events = events.filter(
            (F.col("ts") >= F.lit(t0).cast("timestamp"))
            & (F.col("ts") <= F.lit(t1).cast("timestamp")))
    from optiprism_spark.operators.quality_checks import validate

    if spec["by_day"]:
        events = events.withColumn(
            "day", F.date_trunc("day", F.col("ts")).cast("date"))
        return validate(events, _build(spec), by=["day"])
    return validate(events, _build(spec))


def _metric_sql(c) -> tuple[str, str, str]:
    """(name, target, metric_sql) mirroring suites/quality's recipes."""
    def ratio(num, den="COUNT(*)"):
        return (f"round(CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE)"
                f" / CAST({den} AS DOUBLE) END, 9)")

    k, col = c["kind"], c.get("col")
    if k == "completeness":
        return f"completeness({col})", col, ratio(f"COUNT({col})")
    if k == "uniqueness":
        return (f"uniqueness({col})", col,
                ratio(f"COUNT(DISTINCT {col})"))
    if k == "in_range":
        return (f"in_range({col})", col,
                ratio(f"SUM(CASE WHEN {col} >= {c['range_lo']!r} AND "
                      f"{col} <= {c['range_hi']!r} THEN 1 ELSE 0 END)",
                      f"COUNT({col})"))
    if k == "non_negative":
        return (f"non_negative({col})", col,
                ratio(f"SUM(CASE WHEN {col} >= 0 THEN 1 ELSE 0 END)",
                      f"COUNT({col})"))
    if k == "accepted_values":
        vals = ",".join(f"'{v}'" for v in c["values"])
        return (f"accepted_values({col})", col,
                ratio(f"SUM(CASE WHEN {col} IN ({vals}) THEN 1 ELSE 0 "
                      "END)", f"COUNT({col})"))
    if k == "matches_pattern":
        rx = c["regex"].replace("'", "''")
        return (f"matches_pattern({col})", col,
                ratio(f"SUM(CASE WHEN regexp_matches({col}, '{rx}') "
                      "THEN 1 ELSE 0 END)", f"COUNT({col})"))
    if k == "mean_between":
        return (f"mean_between({col})", col,
                f"round(CAST(SUM(CAST({col} AS DECIMAL(28,6))) AS "
                f"DOUBLE) / COUNT({col}), 9)")
    if k == "freshness":
        return (f"freshness({col})", col,
                f"round((epoch(TIMESTAMP '{c['as_of']}') "
                f"- epoch(MAX({col}))) / 3600.0, 9)")
    return "row_count", "*", "CAST(COUNT(*) AS DOUBLE)"


def spec_to_sql(spec: dict) -> str:
    null_d = "CAST(NULL AS DOUBLE)"
    where = ""
    if "time" in spec:
        t0, t1 = spec["time"]
        where = (f" WHERE ts >= TIMESTAMP '{t0}' "
                 f"AND ts <= TIMESTAMP '{t1}'")
    rows = []
    for c in spec["constraints"]:
        name, target, metric = _metric_sql(c)
        if c["kind"] == "row_count":
            lo = repr(float(c["count_lo"]))
            hi = (null_d if c["count_hi"] is None
                  else repr(float(c["count_hi"])))
        elif c["kind"] == "mean_between":
            lo, hi = repr(float(c["range_lo"])), repr(float(c["range_hi"]))
        elif c["kind"] == "freshness":
            lo, hi = null_d, repr(float(c["max_age"]))
        else:
            lo, hi = repr(float(c["lo"])), null_d
        passed = (f"(({metric}) IS NOT NULL"
                  f" AND ({lo} IS NULL OR ({metric}) >= {lo})"
                  f" AND ({hi} IS NULL OR ({metric}) <= {hi}))")
        day_sel, group = "", ""
        if spec["by_day"]:
            day_sel = "CAST(date_trunc('day', ts) AS DATE) AS day, "
            group = " GROUP BY 1"
        rows.append(
            f"SELECT {day_sel}'{name}' AS \"constraint\", "
            f"'{target}' AS target, {metric} AS metric, "
            f"{lo} AS lower_bound, {hi} AS upper_bound, "
            f"{passed} AS passed FROM events{where}{group}"
        )
    return " UNION ALL ".join(rows)
