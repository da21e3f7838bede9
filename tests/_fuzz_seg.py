"""Differential fuzzer for the event-segmentation JSON DSL.

Generates random-but-seeded reference-shaped request bodies (random
time windows, property filters over a double column / a string column
/ a JSON-extracted int property, breakdowns, 1-3 metric queries per
body), executes them through the REAL serving path
(api.parse_event_segmentation → queries.run_event_segmentation), and
emits the equivalent DuckDB SQL from the same spec. Any divergence —
row count, schema, or value — is a bug in one of the two independent
translations.

This extends the reference's differential-testing strategy (its
ClickHouse oracle suite pins ~fixed queries, reference
tests/queries/*.py) from enumerated cases to the combinatorial space
the DSL actually exposes. The SQL emitter here is intentionally
written against the DSL *spec* (suites/_sql.py conventions), not
against the Spark implementation, so the two sides stay independent.
"""

from __future__ import annotations

import datetime as dt
import random

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

#: DuckDB expression for the JSON int property, matching the engine's
#: PropertyRef.json("k", "int64") resolution (exprs.prop_col)
K_INT = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
#: string-typed resolution (breakdowns carry no literals, so the DSL
#: infers dtype=string — api._infer_dtype)
K_STR = "json_extract_string(props, '$.k')"
DECIMAL_T = "DECIMAL(28,6)"  # keep in sync with suites/_sql.py


def _sum_exact(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS {DECIMAL_T})) AS DOUBLE)"


def _avg_exact(col: str) -> str:
    return f"(CAST(SUM(CAST({col} AS {DECIMAL_T})) AS DOUBLE) / COUNT({col}))"


def _bucket(unit: str) -> str:
    return f"CAST(date_trunc('{unit}', ts) AS DATE)"


def gen_spec(seed: int) -> dict:
    """One deterministic random query spec (the neutral description
    both the JSON body and the oracle SQL are derived from)."""
    rng = random.Random(seed)
    d0 = rng.randint(1, 25)
    start = dt.datetime(2024, 1, d0, rng.choice([0, rng.randint(0, 23)]),
                        rng.choice([0, rng.randint(0, 59)]), 0)
    d1 = rng.randint(d0, 30)
    end = dt.datetime(2024, 1, d1, 23, 59, 59)
    if end < start:
        end = start.replace(hour=23, minute=59, second=59)
    interval = rng.choice(("day", "day", "week", "month"))
    event = rng.choice((None, None) + EVENT_TYPES)

    filters = []
    for _ in range(rng.randint(0, 2)):
        which = rng.choice(("value", "etype", "k"))
        if which == "value":
            op = rng.choice(("gt", "gte", "lt", "lte", "neq"))
            n = rng.choice((1, 1, 1, 2))
            filters.append(
                ("value", op, [round(rng.uniform(0.0, 500.0), 2) for _ in range(n)]))
        elif which == "etype":
            op = rng.choice(("eq", "eq", "neq", "like"))
            if op == "like":
                vals = [rng.choice(("%c%", "%u%", "s%", "%w", "%rror"))]
            else:
                vals = rng.sample(EVENT_TYPES, rng.randint(1, 2))
            filters.append(("event_type", op, vals))
        else:
            op = rng.choice(("gt", "gte", "lt", "lte", "eq", "neq"))
            n = 1 if op in ("gt", "gte", "lt", "lte") else rng.randint(1, 3)
            filters.append(("k", op, [rng.randint(0, 99) for _ in range(n)]))

    breakdown = rng.choice((None, None, "event_type", "k"))

    pool = ("countEvents", "countUniqueGroups", "aggValue", "aggK",
            "countPerGroup", "dailyActive")
    queries = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(pool)
        if kind == "aggValue":
            queries.append((kind, rng.choice(("sum", "min", "max", "avg"))))
        elif kind == "aggK":
            queries.append((kind, rng.choice(("sum", "min", "max", "avg",
                                              "median"))))
        elif kind == "countPerGroup":
            queries.append((kind, "avg"))
        else:
            queries.append((kind, None))

    # optional QueryFormula over sibling metric aliases: numerator is
    # any metric, denominator a count-family one (never 0 in emitted
    # groups); the 100e0 factor forces double arithmetic on both sides.
    dens = [i for i, (k, _) in enumerate(queries)
            if k in ("countEvents", "countUniqueGroups", "dailyActive")]
    if dens and rng.random() < 0.3:
        num = rng.randrange(len(queries))
        queries.append(("formula", (num, rng.choice(dens))))

    # split filters between the two DSL surfaces that must behave
    # identically: body.filters.groups[0].filters (global) and
    # events[0].filters (per-event) — both AND into the same scan
    n_event_level = rng.randint(0, len(filters))

    # optional behavioral segment (reference Or<And<condition>>): the
    # series is then computed over the cohort's users only (semi-join)
    segment = None
    if rng.random() < 0.35:
        conds = []
        for _ in range(rng.randint(1, 2)):
            ck = rng.choice(("count", "count", "sum_value", "hasprop_k"))
            if ck == "count":
                conds.append(("count", rng.choice(EVENT_TYPES),
                              rng.choice(("gte", "gt", "lte", "eq")),
                              rng.randint(1, 5)))
            elif ck == "sum_value":
                conds.append(("sum_value", rng.choice(EVENT_TYPES),
                              rng.choice(("gt", "lte")),
                              round(rng.uniform(50.0, 2000.0), 2)))
            else:
                conds.append(("hasprop_k", None,
                              rng.choice(("gte", "lte")), rng.randint(0, 99)))
        segment = conds
    return {
        "seed": seed, "start": start, "end": end, "interval": interval,
        "event": event, "filters": filters, "breakdown": breakdown,
        "queries": queries, "n_event_level": n_event_level,
        "segment": segment,
    }


def _engine_alias(qi: int, kind: str, agg) -> str:
    """Replicate operators/aggregates._query_alias for fuzzed queries."""
    name = {
        "countEvents": "count_events",
        "countUniqueGroups": "count_unique_groups",
        "dailyActive": "daily_active_groups",
        "countPerGroup": "count_per_group_avg",
        "aggValue": f"aggregate_property_{agg}",
        "aggK": f"aggregate_property_{agg}",
        "formula": "formula",
    }[kind]
    return f"0_{qi}_{name}"


def _filter_dict(name: str, op: str, vals: list) -> dict:
    return {"type": "property", "propertyType": "event",
            "propertyName": name, "operation": op, "value": list(vals)}


def spec_to_body(s: dict) -> dict:
    """The camelCase reference-shaped JSON request body."""
    qdicts = []
    for kind, agg in s["queries"]:
        if kind == "countEvents":
            qdicts.append({"type": "countEvents"})
        elif kind == "countUniqueGroups":
            qdicts.append({"type": "countUniqueGroups"})
        elif kind == "dailyActive":
            qdicts.append({"type": "dailyActiveGroups"})
        elif kind == "countPerGroup":
            qdicts.append({"type": "countPerGroup", "aggregate": agg})
        elif kind == "aggValue":
            qdicts.append({"type": "aggregateProperty", "aggregate": agg,
                           "propertyType": "event", "propertyName": "value"})
        elif kind == "aggK":
            qdicts.append({"type": "aggregateProperty", "aggregate": agg,
                           "propertyType": "event", "propertyName": "k",
                           "dtype": "int64"})
        elif kind == "formula":
            num, den = agg
            nk, na = s["queries"][num]
            dk, da = s["queries"][den]
            # 100e0: a DOUBLE literal in both dialects (plain 100.0
            # parses as DECIMAL in Spark SQL and would decimal-taint
            # the whole expression)
            qdicts.append({"type": "formula", "formula": (
                f"`{_engine_alias(num, nk, na)}` * 100e0"
                f" / `{_engine_alias(den, dk, da)}`")})
    ev_filters = [_filter_dict(*f) for f in s["filters"][:s["n_event_level"]]]
    global_filters = [_filter_dict(*f) for f in s["filters"][s["n_event_level"]:]]
    body = {
        "time": {"type": "between", "from": s["start"].isoformat(),
                 "to": s["end"].isoformat()},
        "group": "user",
        "intervalUnit": s["interval"],
        "chartType": "line",
        "analysis": {"type": "linear"},
        "events": [{"eventName": s["event"], "eventType": "regular",
                    "queries": qdicts,
                    **({"filters": ev_filters} if ev_filters else {})}],
    }
    if global_filters:
        body["filters"] = {"groups": [{"filters": global_filters}]}
    if s["breakdown"]:
        body["breakdowns"] = [{"type": "property", "propertyType": "event",
                               "propertyName": s["breakdown"]}]
    if s.get("segment"):
        tdict = dict(body["time"])
        conds = []
        for kind, ev, op, val in s["segment"]:
            if kind == "count":
                conds.append({"DidEvent": {
                    "event": {"eventName": ev, "eventType": "regular"},
                    "aggregate": {"Count": {"operation": op, "value": val,
                                            "time": tdict}},
                }})
            elif kind == "sum_value":
                conds.append({"DidEvent": {
                    "event": {"eventName": ev, "eventType": "regular"},
                    "aggregate": {"AggregateProperty": {
                        "aggregate": "sum",
                        "property": {"propertyType": "event",
                                     "propertyName": "value"},
                        "operation": op, "value": val, "time": tdict}},
                }})
            else:  # hasprop_k
                conds.append({"HasPropertyValue": {
                    "property": {"propertyType": "event",
                                 "propertyName": "k", "dtype": "int64"},
                    "operation": op, "value": [val], "time": tdict,
                }})
        body["segments"] = [{"name": "s0", "conditions": [conds]}]
    return body


def _sql_lit(name: str, v) -> str:
    return f"'{v}'" if name == "event_type" else repr(v)


def _sql_cond(name: str, op: str, vals: list) -> str:
    col = {"value": "value", "event_type": "event_type", "k": K_INT}[name]
    lits = [_sql_lit(name, v) for v in vals]
    if op == "eq":
        return (f"{col} IN ({', '.join(lits)})" if len(vals) > 1
                else f"{col} = {lits[0]}")
    if op == "neq":
        return (f"NOT ({col} IN ({', '.join(lits)}))" if len(vals) > 1
                else f"NOT ({col} = {lits[0]})")
    if op in ("gt", "gte", "lt", "lte"):
        sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}[op]
        return "(" + " OR ".join(f"{col} {sym} {x}" for x in lits) + ")"
    if op == "like":
        return f"{col} LIKE {lits[0]}"
    raise ValueError(op)


def _metric_sql(kind: str, agg) -> str:
    if kind == "countEvents":
        return "COUNT(*)"
    if kind == "countUniqueGroups":
        return "COUNT(DISTINCT user_id)"
    if kind == "dailyActive":
        return f"COUNT(DISTINCT (user_id, {_bucket('day')}))"
    if kind == "aggValue":
        col = "value"
    elif kind == "aggK":
        col = K_INT
    else:
        raise ValueError(kind)
    if agg == "sum":
        return _sum_exact(col)
    if agg == "avg":
        return _avg_exact(col)
    if agg == "median":
        # int-typed only: both engines interpolate the midpoint of two
        # small ints exactly in double (suites seg_agg_int_prop
        # precedent); double-typed medians would differ in ULPs
        return f"median({col})"
    return f"{agg.upper()}({col})"


def spec_to_sql(s: dict, extra_pred: str = None) -> str:
    """Equivalent DuckDB SQL, derived from the spec (NOT from the
    Spark plan): metric columns are q{i} in query order.
    ``extra_pred``: extra WHERE conjunct on the events scan (the
    estimation fuzzer's user-sample predicate)."""
    time_cond = (
        f"ts >= TIMESTAMP '{s['start']:%Y-%m-%d %H:%M:%S}' "
        f"AND ts <= TIMESTAMP '{s['end']:%Y-%m-%d %H:%M:%S}'"
    )
    conds = [time_cond]
    if extra_pred:
        conds.append(extra_pred)
    if s["event"]:
        conds.append(f"event_type = '{s['event']}'")
    conds += [_sql_cond(*f) for f in s["filters"]]

    keys = ["bucket"]
    key_exprs = [f"{_bucket(s['interval'])} AS bucket"]
    if s.get("segment"):
        sym = {"gte": ">=", "gt": ">", "lte": "<=", "eq": "="}
        zero_ok = {"gte": lambda v: 0 >= v, "gt": lambda v: 0 > v,
                   "lte": lambda v: 0 <= v, "eq": lambda v: 0 == v}
        parts = []
        for kind, ev, op, val in s["segment"]:
            if kind == "count":
                if zero_ok[op](val):
                    # engine semantics (operators/segments.py
                    # _zero_count_qualifies): "did at most N times"
                    # includes users with ZERO matching events — the
                    # cohort is the full distinct-user universe minus
                    # the complement
                    parts.append(
                        f"SELECT DISTINCT user_id FROM events "
                        f"EXCEPT SELECT user_id FROM events "
                        f"WHERE {time_cond} AND event_type = '{ev}' "
                        f"GROUP BY 1 HAVING NOT (COUNT(*) {sym[op]} {val})")
                else:
                    parts.append(
                        f"SELECT user_id FROM events WHERE {time_cond} "
                        f"AND event_type = '{ev}' GROUP BY 1 "
                        f"HAVING COUNT(*) {sym[op]} {val}")
            elif kind == "sum_value":
                parts.append(
                    f"SELECT user_id FROM events WHERE {time_cond} "
                    f"AND event_type = '{ev}' GROUP BY 1 "
                    f"HAVING {_sum_exact('value')} {sym[op]} {val}")
            else:
                parts.append(
                    f"SELECT DISTINCT user_id FROM events WHERE {time_cond} "
                    f"AND {K_INT} {sym[op]} {val}")
        # parenthesize: INTERSECT binds tighter than the EXCEPT inside
        # the zero-qualifying count part
        conds.append(
            "user_id IN (" + " INTERSECT ".join(f"({p})" for p in parts) + ")")
        keys.append("segment")
        key_exprs.append("'s0' AS segment")
    where = " AND ".join(conds)
    if s["breakdown"] == "event_type":
        keys.append("event_type")
        key_exprs.append("event_type")
    elif s["breakdown"] == "k":
        keys.append("k")
        key_exprs.append(f"{K_STR} AS k")

    simple, two_level, formulas = [], [], []
    for qi, (kind, agg) in enumerate(s["queries"]):
        if kind == "countPerGroup":
            two_level.append((qi, kind, agg))
        elif kind == "formula":
            num, den = agg
            formulas.append(f"q{num} * 100e0 / q{den} AS q{qi}")
        else:
            simple.append(f"{_metric_sql(kind, agg)} AS q{qi}")

    key_list = ", ".join(keys)
    base = f"SELECT * FROM events WHERE {where}"

    def _with_formulas(sql: str) -> str:
        if not formulas:
            return sql
        return f"SELECT *, {', '.join(formulas)} FROM ({sql})"

    if not two_level:
        return _with_formulas(
            f"SELECT {', '.join(key_exprs + simple)} "
            f"FROM ({base}) GROUP BY {key_list}")

    # per-group inner count → outer avg, joined back onto the simple
    # aggregates on the (bucket, breakdown) keys; both sides aggregate
    # the same filtered rows, so the key sets are identical
    outer = ", ".join(f"{_avg_exact('__c')} AS q{qi}" for qi, _, _ in two_level)
    two_sql = (
        f"SELECT {key_list}, {outer} FROM ("
        f"  SELECT {', '.join(key_exprs)}, user_id, COUNT(*) AS __c"
        f"  FROM ({base}) GROUP BY {key_list}, user_id"
        f") GROUP BY {key_list}"
    )
    if not simple:
        return _with_formulas(two_sql)
    simple_sql = (f"SELECT {', '.join(key_exprs + simple)} "
                  f"FROM ({base}) GROUP BY {key_list}")
    return _with_formulas(
        f"SELECT * FROM ({simple_sql}) s JOIN ({two_sql}) t "
        f"USING ({key_list})")


def run_spec(spark, sf_dir: str, spec: dict):
    """Execute the spec's JSON body through the serving path; return
    the result with metric columns renamed q{i} to match the SQL."""
    from optiprism_spark.api import parse_event_segmentation
    from optiprism_spark.operators.aggregates import _query_alias
    from optiprism_spark.queries.event_segmentation import run_event_segmentation
    from optiprism_spark.schema import load_table

    req = parse_event_segmentation(spec_to_body(spec))
    events = load_table(spark, sf_dir, "events")
    df = run_event_segmentation(events, req)
    renames = {
        _query_alias(0, qi, q): f"q{qi}"
        for qi, q in enumerate(req.events[0].queries)
    }
    return df.withColumnsRenamed(renames)
