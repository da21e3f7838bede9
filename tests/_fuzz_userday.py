"""User-day store differential fuzz: routed ≡ raw over random
day-aligned windows, event filters, audience set expressions and
intervals — the store-serving twin of _fuzz_rollup (r16).

The RAW operators are the oracle here (they are themselves fuzzed vs
DuckDB by the seg/journeys suites); this family pins the claim the
user-day tier makes everywhere: any surface it serves folds from
(dt, user, event_type) partials to EXACTLY the raw answer. Surfaces:
set_count, scoped_count (independent cohort window), active_users
(day/week/month), active_days, retention (bounded/unbounded), growth,
rfm. Protocol: gen_spec(seed) + run_check(spark, sf_dir, spec) — the
self-contained differential branch of fuzz_check.py.
"""

from __future__ import annotations

import datetime as dt
import random

from optiprism_spark.dsl import EventRef, QueryTime, TimeIntervalUnit

_EVENTS = ["click", "error", "purchase", "signup", "view"]
_INTERVALS = [TimeIntervalUnit.DAY, TimeIntervalUnit.WEEK,
              TimeIntervalUnit.MONTH]
_SURFACES = ["set_count", "scoped_count", "active_users", "active_days",
             "retention", "growth", "rfm", "lness"]

_STORES: dict = {}


def _store(spark, sf_dir: str):
    from optiprism_spark.schema import load_table
    from optiprism_spark.userday import UserDayStore

    st = _STORES.get(sf_dir)
    if st is None:
        import atexit
        import os
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="optiprism_fuzz_userday_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        st = UserDayStore(os.path.join(d, "ud"))
        st.rebuild(spark, load_table(spark, sf_dir, "events"))
        _STORES[sf_dir] = st
    return st


def _rand_window(rng: random.Random) -> tuple[dt.datetime, dt.datetime]:
    d0 = rng.randint(1, 24)
    d1 = rng.randint(d0, 31)
    return (dt.datetime(2024, 1, d0),
            dt.datetime(2024, 1, d1, 23, 59, 59, 999999))


def _rand_expr(rng: random.Random, names: list[str]) -> dict:
    """Random boolean AST over the audience names, depth ≤ 2."""
    def leaf():
        return {"ref": rng.choice(names)}

    roll = rng.random()
    if roll < 0.3:
        return leaf()
    if roll < 0.55:
        return {"op": "and", "args": [leaf(), leaf()]}
    if roll < 0.8:
        return {"op": "or", "args": [leaf(), leaf()]}
    inner = {"op": rng.choice(["and", "or"]), "args": [leaf(), leaf()]}
    return {"op": "and",
            "args": [inner, {"op": "not", "args": [leaf()]}]}


def gen_spec(seed: int) -> dict:
    rng = random.Random(f"userday-{seed}")
    surface = rng.choice(_SURFACES)
    lo, hi = _rand_window(rng)
    spec: dict = {"surface": surface, "lo": lo, "hi": hi}
    if surface in ("set_count", "scoped_count"):
        k = rng.randint(2, 3)
        spec["audiences"] = rng.sample(_EVENTS, k)
        spec["expr"] = _rand_expr(
            rng, [f"a{i}" for i in range(k)])
        if surface == "scoped_count":
            spec["interval"] = rng.choice(_INTERVALS)
            # independent (still day-aligned) cohort window half the
            # time — the cohort-trend composition
            if rng.random() < 0.5:
                spec["aud_lo"], spec["aud_hi"] = _rand_window(rng)
    if surface in ("active_users", "growth"):
        spec["interval"] = rng.choice(_INTERVALS)
    if surface == "retention":
        spec["interval"] = rng.choice(_INTERVALS)
        spec["cohort"], spec["ret"] = rng.sample(_EVENTS, 2)
        spec["unbounded"] = rng.random() < 0.5
        spec["max_periods"] = rng.randint(3, 10)
    if surface in ("active_users", "active_days", "rfm", "lness"):
        spec["event"] = rng.choice([None] + _EVENTS)
    if surface == "lness":
        spec["anchor"] = dt.date(2024, 1, rng.randint(8, 31))
        spec["l_long"] = rng.randint(3, 28)
        spec["l_short"] = rng.randint(1, spec["l_long"] - 1)
    return spec


def run_check(spark, sf_dir: str, spec: dict) -> dict:
    from pyspark.sql import functions as F

    from optiprism_spark.operators.audience import (
        audience_set_count,
        audience_users,
    )
    from optiprism_spark.operators.engagement import (
        growth_accounting,
        rfm_scores,
    )
    from optiprism_spark.operators.retention import retention
    from optiprism_spark.schema import load_table
    from optiprism_spark.userday import (
        active_days_from_user_day,
        active_users_from_user_day,
        growth_from_user_day,
        retention_from_user_day,
        rfm_from_user_day,
        scoped_count_from_user_day,
        set_count_from_user_day,
    )

    ev = load_table(spark, sf_dir, "events")
    st = _store(spark, sf_dir)
    sd = st.read(spark)
    W = QueryTime.between(spec["lo"], spec["hi"])
    surface = spec["surface"]
    event = (EventRef(spec["event"]) if spec.get("event") else None)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    if surface == "set_count":
        auds = {f"a{i}": EventRef(e)
                for i, e in enumerate(spec["audiences"])}
        raw = rows(audience_set_count(ev, auds, spec["expr"], W))
        got = rows(set_count_from_user_day(sd, auds, spec["expr"], W))
    elif surface == "scoped_count":
        auds = {f"a{i}": EventRef(e)
                for i, e in enumerate(spec["audiences"])}
        AW = (QueryTime.between(spec["aud_lo"], spec["aud_hi"])
              if "aud_lo" in spec else W)
        users = audience_users(ev, auds, spec["expr"], AW)
        from optiprism_spark.exprs import full_filter
        from optiprism_spark.operators.aggregates import bucket_col

        raw = rows(
            ev.filter(full_filter(W))
            .join(F.broadcast(users.select("user_id")), "user_id",
                  "left_semi")
            .groupBy(bucket_col(spec["interval"]).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("count")))
        got = rows(scoped_count_from_user_day(
            sd, auds, spec["expr"], W, spec["interval"],
            audience_time=AW))
    elif surface == "active_users":
        from optiprism_spark.exprs import full_filter
        from optiprism_spark.operators.aggregates import bucket_col

        flt = full_filter(W, event, ())
        raw = rows(
            ev.filter(flt)
            .groupBy(bucket_col(spec["interval"]).alias("bucket"))
            .agg(F.count_distinct("user_id").alias("active_users")))
        got = rows(active_users_from_user_day(
            sd, W, spec["interval"], event=event))
    elif surface == "active_days":
        from optiprism_spark.exprs import full_filter

        flt = full_filter(W, event, ())
        per_user = (ev.filter(flt).groupBy("user_id")
                    .agg(F.count_distinct(
                        F.to_date("ts")).alias("active_days")))
        raw = rows(per_user.groupBy("active_days")
                   .agg(F.count(F.lit(1)).alias("n_users")))
        got = rows(active_days_from_user_day(sd, W, event=event))
    elif surface == "retention":
        raw = rows(retention(
            ev, EventRef(spec["cohort"]), EventRef(spec["ret"]), W,
            spec["interval"], max_periods=spec["max_periods"],
            unbounded=spec["unbounded"]))
        got = rows(retention_from_user_day(
            sd, EventRef(spec["cohort"]), EventRef(spec["ret"]), W,
            spec["interval"], max_periods=spec["max_periods"],
            unbounded=spec["unbounded"]))
    elif surface == "growth":
        raw = rows(growth_accounting(ev, W, spec["interval"]))
        got = rows(growth_from_user_day(sd, W, spec["interval"]))
    elif surface == "lness":
        from optiprism_spark.operators.engagement import lness_grid
        from optiprism_spark.userday import lness_from_user_day

        raw = rows(lness_grid(
            ev, spec["anchor"], l_short=spec["l_short"],
            l_long=spec["l_long"], event=event))
        got = rows(lness_from_user_day(
            sd, spec["anchor"], l_short=spec["l_short"],
            l_long=spec["l_long"], event=event))
    else:  # rfm
        raw = rows(rfm_scores(ev, W, n_tiles=5, event=event,
                              percentile_mode="exact"))
        got = rows(rfm_from_user_day(sd, W, n_tiles=5, event=event,
                                     percentile_mode="exact"))
    assert got == raw, (
        f"user-day routed != raw for {surface}: "
        f"{len(got)} vs {len(raw)} rows; first diff "
        f"{next(iter(set(got) ^ set(raw)), None)}")
    return {"routed": True}
