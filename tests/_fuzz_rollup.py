"""Differential fuzzer for the rollup query-rewrite seam.

The routing layer (rollup.rollup_supports / activity_supports +
event_segmentation_from_rollup / stickiness_from_rollup /
cohort_sizes_from_rollup) is the newest wrong-answer-prone code path:
a routability guard that accepts a shape the rollup cannot actually
fold produces silently wrong numbers. This fuzzer generates random
request shapes — day-aligned and ragged windows, dim/JSON-dim/
non-dim filters, routable and unroutable metrics — and asserts:

(a) whenever the guard says ROUTE, routed ≡ raw: exact equality on
    count/sum/min/max/avg metrics, sparse-regime HLL tolerance on the
    approx distinct metrics (exact at sf0.01 cardinalities);
(b) guard refusals are exercised (the sweep records the routed
    fraction so generator drift can't silently stop testing routing);
(c) post-erasure maintenance (RollupStore.recompute_days) leaves the
    store equivalent to a from-scratch rebuild of the post-erasure
    lake, both at the store surface and through a routed query.

Unlike the other fuzzers there is no DuckDB emitter here: the raw
Spark path IS the oracle — it is itself differentially fuzzed against
DuckDB by tests/_fuzz_seg.py, so routed-vs-raw equivalence closes the
chain routed ≡ raw ≡ SQL.
"""

from __future__ import annotations

import datetime as dt
import random
import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from optiprism_spark.dsl import (
    EventQuery,
    EventRef,
    EventSegmentationRequest,
    PropFilter,
    PropOp,
    PropertyRef,
    QueryTime,
    SegQuery,
    TimeIntervalUnit,
)

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

#: the fuzzed store declares the segmentation dims + one JSON dim +
#: the one numeric metric column — the same shape the suites register
_SPEC = None


def _spec():
    global _SPEC
    if _SPEC is None:
        from optiprism_spark.rollup import RollupSpec

        _SPEC = RollupSpec(
            dims=("event_type",),
            numeric_props=("value",),
            json_dims=(("k", "int64"),),
        )
    return _SPEC


_ORG_SPEC = None


def _org_spec():
    """A second, ORG-grain rollup spec (group_col != user): declared
    FIRST in the multi-rollup list so the sweep continuously proves
    the grain guard — its user sketches must never answer a
    user-grain uniques/actives question, while its grain-free metrics
    (count/sum/min/max) remain routable."""
    global _ORG_SPEC
    if _ORG_SPEC is None:
        from optiprism_spark.rollup import RollupSpec

        _ORG_SPEC = RollupSpec(
            dims=("event_type",),
            numeric_props=("value",),
            json_dims=(("k", "int64"),),
            group_col="org_id",
        )
    return _ORG_SPEC


_CACHE: dict[str, tuple] = {}


def _events_and_rollup(spark, sf_dir: str):
    """(events, user-grain rollup, org-grain rollup) built once per
    sf_dir and cached for the sweep."""
    if sf_dir not in _CACHE:
        from optiprism_spark.rollup import build_rollup
        from optiprism_spark.schema import load_table

        events = load_table(spark, sf_dir, "events").cache()
        roll = build_rollup(events, _spec()).cache()
        roll.count()
        org_roll = build_rollup(
            events.withColumn("org_id", F.col("user_id") % 7),
            _org_spec(),
        ).cache()
        org_roll.count()
        _CACHE[sf_dir] = (events, roll, org_roll)
    return _CACHE[sf_dir]


# ------------------------------------------------------------- generation


def _gen_time(rng: random.Random) -> tuple[dt.datetime, dt.datetime, bool]:
    d0 = rng.randint(1, 25)
    d1 = rng.randint(d0, 30)
    if rng.random() < 0.8:  # day-aligned: the routable shape
        return (
            dt.datetime(2024, 1, d0),
            dt.datetime(2024, 1, d1, 23, 59, 59, 999999),
            True,
        )
    # ragged start or end: must NOT route
    if rng.random() < 0.5:
        start = dt.datetime(2024, 1, d0, rng.randint(1, 23))
        end = dt.datetime(2024, 1, d1, 23, 59, 59, 999999)
    else:
        start = dt.datetime(2024, 1, d0)
        end = dt.datetime(2024, 1, d1, 23, 59, 59)
    return start, end, False


def _gen_filters(rng: random.Random) -> list[tuple]:
    out = []
    for _ in range(rng.randint(0, 2)):
        which = rng.choice(("etype", "etype", "k", "value"))
        if which == "etype":
            op = rng.choice(("eq", "neq", "like"))
            vals = (
                [rng.choice(("%c%", "s%", "%rror"))]
                if op == "like"
                else rng.sample(EVENT_TYPES, rng.randint(1, 2))
            )
            out.append(("etype", op, vals))
        elif which == "k":  # JSON dim, routable
            op = rng.choice(("eq", "neq", "gt", "lte"))
            n = rng.randint(1, 2) if op in ("eq", "neq") else 1
            out.append(("k", op, [rng.randint(0, 99) for _ in range(n)]))
        else:  # numeric non-dim column: must NOT route
            out.append(
                ("value", rng.choice(("gt", "lte")),
                 [round(rng.uniform(0.0, 400.0), 2)]))
    return out


def gen_spec(seed: int) -> dict:
    rng = random.Random(seed)
    kind = ("seg", "seg", "seg", "seg", "seg", "seg", "seg",
            "activity", "activity", "maintenance")[seed % 10]
    start, end, aligned = _gen_time(rng)
    spec: dict = {"seed": seed, "kind": kind, "start": start, "end": end,
                  "aligned": aligned}
    if kind == "maintenance":
        spec["erase_kind"] = rng.choice(("user", "user", "day"))
        spec["victim"] = rng.randint(0, 400)
        spec["day"] = dt.date(2024, 1, rng.randint(1, 30))
        return spec
    spec["event"] = rng.choice((None, None) + EVENT_TYPES)
    spec["filters"] = _gen_filters(rng)
    if kind == "activity":
        spec["surface"] = rng.choice(("stickiness", "cohort"))
        spec["period"] = rng.choice(("week", "month"))
        spec["cohort_interval"] = rng.choice(("day", "week", "month"))
        if spec["surface"] == "cohort" and spec["event"] is None:
            spec["event"] = rng.choice(EVENT_TYPES)
        return spec
    # segmentation
    spec["interval"] = rng.choice(("day", "day", "week", "month", "hour"))
    spec["breakdown"] = rng.choice((None, None, "event_type", "k"))
    pool = ("countEvents", "aggValue", "uniquesApprox", "uniquesExact",
            "dailyActive", "weeklyActive", "countPerGroup")
    queries = []
    for _ in range(rng.randint(1, 3)):
        q = rng.choice(pool)
        agg = rng.choice(("sum", "min", "max", "avg", "count")) \
            if q == "aggValue" else None
        queries.append((q, agg))
    dens = [i for i, (q, _) in enumerate(queries) if q == "countEvents"]
    if dens and rng.random() < 0.25:
        queries.append(("formula", (rng.randrange(len(queries)),
                                    rng.choice(dens))))
    spec["queries"] = queries
    # 25%: a SECOND event-query — the per-event-query routing seam
    # (one may route while the other falls back; the merge must agree)
    if rng.random() < 0.25:
        spec["event2"] = rng.choice(EVENT_TYPES)
        q2 = rng.choice(pool)
        agg2 = rng.choice(("sum", "avg")) if q2 == "aggValue" else None
        spec["queries2"] = [(q2, agg2)]
    return spec


# ------------------------------------------------------------ construction


def _prop_filters(fs) -> tuple:
    out = []
    for name, op, vals in fs:
        if name == "etype":
            out.append(PropFilter(
                PropertyRef.column("event_type"), PropOp(op), list(vals)))
        elif name == "k":
            out.append(PropFilter(
                PropertyRef.json("k", "int64"), PropOp(op), list(vals)))
        else:
            out.append(PropFilter(
                PropertyRef.column("value"), PropOp(op), list(vals)))
    return tuple(out)


def _seg_request(spec: dict) -> EventSegmentationRequest:
    from optiprism_spark.operators.aggregates import _query_alias

    qs = []
    for q, agg in spec["queries"]:
        if q == "countEvents":
            qs.append(SegQuery(kind="count_events"))
        elif q == "aggValue":
            from optiprism_spark.dsl import AggFn

            qs.append(SegQuery(kind="aggregate_property", agg=AggFn(agg),
                               prop=PropertyRef.column("value")))
        elif q == "uniquesApprox":
            qs.append(SegQuery(kind="count_unique_groups", approx=True))
        elif q == "uniquesExact":
            qs.append(SegQuery(kind="count_unique_groups"))
        elif q == "dailyActive":
            qs.append(SegQuery(kind="daily_active_groups", approx=True))
        elif q == "weeklyActive":
            qs.append(SegQuery(kind="weekly_active_groups", approx=True))
        elif q == "countPerGroup":
            from optiprism_spark.dsl import AggFn

            qs.append(SegQuery(kind="count_per_group", agg=AggFn("avg")))
        else:  # formula over sibling aliases
            num, den = agg
            na = _query_alias(0, num, _mk(spec["queries"][num]))
            da = _query_alias(0, den, _mk(spec["queries"][den]))
            qs.append(SegQuery(
                kind="formula", formula=f"`{na}` * 100e0 / `{da}`"))
    breakdowns = ()
    if spec["breakdown"] == "event_type":
        breakdowns = (PropertyRef.column("event_type"),)
    elif spec["breakdown"] == "k":
        breakdowns = (PropertyRef.json("k", "int64"),)
    eqs = [
        EventQuery(
            event=EventRef(spec["event"]) if spec["event"] else EventRef(None),
            queries=tuple(qs),
            breakdowns=breakdowns,
        ),
    ]
    if spec.get("queries2"):
        eqs.append(EventQuery(
            event=EventRef(spec["event2"]),
            queries=tuple(
                _mk(qa) for qa in spec["queries2"]),
            breakdowns=breakdowns,
        ))
    return EventSegmentationRequest(
        time=QueryTime.between(spec["start"], spec["end"]),
        interval=TimeIntervalUnit(spec["interval"]),
        events=tuple(eqs),
        filters=_prop_filters(spec["filters"]),
    )


def _mk(qa) -> SegQuery:
    """Rebuild the SegQuery for alias computation only."""
    q, agg = qa
    from optiprism_spark.dsl import AggFn

    kinds = {
        "countEvents": SegQuery(kind="count_events"),
        "uniquesApprox": SegQuery(kind="count_unique_groups", approx=True),
        "uniquesExact": SegQuery(kind="count_unique_groups"),
        "dailyActive": SegQuery(kind="daily_active_groups", approx=True),
        "weeklyActive": SegQuery(kind="weekly_active_groups", approx=True),
        "countPerGroup": SegQuery(kind="count_per_group", agg=AggFn("avg")),
    }
    if q == "aggValue":
        return SegQuery(kind="aggregate_property", agg=AggFn(agg),
                        prop=PropertyRef.column("value"))
    return kinds[q]


# -------------------------------------------------------------- comparison


def _compare(routed: pd.DataFrame, raw: pd.DataFrame,
             approx_cols: set, name: str,
             ratio_cols: set = frozenset()) -> None:
    """approx_cols are count-like (HLL estimates: rtol + off-by-ones at
    tiny counts → atol=1.0); ratio_cols are bounded in [0,1], where an
    atol of 1.0 would make the check unfalsifiable — they get a
    rtol-only tolerance (atol=1e-9)."""
    assert sorted(routed.columns) == sorted(raw.columns), (
        f"{name}: columns {sorted(routed.columns)} != {sorted(raw.columns)}")
    assert len(routed) == len(raw), (
        f"{name}: rows {len(routed)} != {len(raw)}")
    cols = sorted(routed.columns)
    a = routed[cols].copy()
    b = raw[cols].copy()
    loose = approx_cols | ratio_cols
    key = [c for c in cols if c not in loose] or cols
    a = a.sort_values(by=key, key=lambda s: s.astype(str)).reset_index(drop=True)
    b = b.sort_values(by=key, key=lambda s: s.astype(str)).reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if c in loose:
            fa = av.astype(float).to_numpy()
            fb = bv.astype(float).to_numpy()
            import numpy as np

            atol = 1e-9 if c in ratio_cols else 1.0
            bad = ~(np.isclose(fa, fb, rtol=0.02, atol=atol)
                    | (np.isnan(fa) & np.isnan(fb)))
            if bad.any():
                i = int(np.argmax(bad))
                raise AssertionError(
                    f"{name}: approx col {c} row {i}: {fa[i]} vs {fb[i]}")
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(eq.to_numpy().argmin())
                raise AssertionError(
                    f"{name}: col {c} row {i}: "
                    f"{av.iloc[i]!r} != {bv.iloc[i]!r}")


# ------------------------------------------------------------------ checks


def run_check(spark, sf_dir: str, spec: dict) -> dict:
    """Raise on any invariant violation; return {'routed': bool}."""
    if spec["kind"] == "seg":
        return _check_seg(spark, sf_dir, spec)
    if spec["kind"] == "activity":
        return _check_activity(spark, sf_dir, spec)
    return _check_maintenance(spark, sf_dir, spec)


def _check_seg(spark, sf_dir: str, spec: dict) -> dict:
    """Drive the REAL serving seam: run_event_segmentation with the
    rollup attached (per-event-query routing + fallback + multi-event
    merge) vs the same call without it. The guard asserts below pin
    the routability decision; the frame compare pins routed ≡ raw
    through the full pipeline, including requests where one event
    routes and the other falls back."""
    from optiprism_spark.operators.aggregates import _query_alias
    from optiprism_spark.queries.event_segmentation import (
        run_event_segmentation,
    )
    from optiprism_spark.rollup import rollup_supports

    events, roll, org_roll = _events_and_rollup(spark, sf_dir)
    req = _seg_request(spec)
    routed_eqs = [
        rollup_supports(req, eq, _spec()) for eq in req.events
    ]
    # grain guard: the ORG rollup must never route a user-grain
    # uniques/actives question (it MAY route grain-free count/agg)
    for eq in req.events:
        if any(q.kind.endswith("_groups") for q in eq.queries):
            assert not rollup_supports(req, eq, _org_spec()), (
                f"org rollup routed a user-grain sketch metric: {spec}")
    # hard refusals the guard must always make (first event-query
    # carries the generated shape; the second is routable-shaped)
    routed_ok = routed_eqs[0]
    if not spec["aligned"] or spec["interval"] == "hour":
        assert not any(routed_eqs), f"routed a non-routable window: {spec}"
    if any(f[0] == "value" for f in spec["filters"]):
        assert not any(routed_eqs), f"routed a non-dim filter: {spec}"
    if any(q in ("uniquesExact", "countPerGroup")
           for q, _ in spec["queries"]):
        assert not routed_ok, f"routed a raw-grain metric: {spec}"
    if not any(routed_eqs) and spec["seed"] % 4:
        # nothing routes: the attached-rollup call degenerates to the
        # raw path — spot-check the fallback on a quarter of seeds
        return {"routed": False}
    raw = run_event_segmentation(events, req).toPandas()
    # org-grain rollup declared FIRST: "first supporting spec wins"
    # must pick it only for grain-free metrics, skip it for sketch
    # metrics, and either way agree with raw
    routed = run_event_segmentation(
        events, req,
        rollup=[(org_roll, _org_spec()), (roll, _spec())]).toPandas()
    approx = set()
    for ei, eq_spec in enumerate(
            [spec["queries"]] + ([spec["queries2"]]
                                 if spec.get("queries2") else [])):
        approx |= {
            _query_alias(ei, qi, _mk(qa))
            for qi, qa in enumerate(eq_spec)
            if qa[0] in ("uniquesApprox", "dailyActive", "weeklyActive")
        }
    _compare(routed, raw, approx, f"seg seed={spec['seed']}")
    return {"routed": any(routed_eqs)}


def _check_activity(spark, sf_dir: str, spec: dict) -> dict:
    from optiprism_spark.operators.engagement import stickiness
    from optiprism_spark.operators.retention import _cohorts_and_sizes
    from optiprism_spark.rollup import (
        activity_supports,
        cohort_sizes_from_rollup,
        stickiness_from_rollup,
    )

    events, roll, org_roll = _events_and_rollup(spark, sf_dir)
    time = QueryTime.between(spec["start"], spec["end"])
    event = EventRef(spec["event"]) if spec["event"] else None
    filters = _prop_filters(spec["filters"])
    # the grain guard must refuse the org rollup for EVERY user-grain
    # activity question, whatever the window/filter shape
    assert not activity_supports(time, event, filters, _org_spec()), (
        f"org rollup passed the user-grain activity guard: {spec}")
    routed_ok = activity_supports(time, event, filters, _spec())
    if not spec["aligned"]:
        assert not routed_ok, f"routed ragged window: {spec}"
    if any(f[0] == "value" for f in spec["filters"]):
        assert not routed_ok, f"routed non-dim filter: {spec}"
    if not routed_ok:
        return {"routed": False}
    if spec["surface"] == "stickiness":
        period = TimeIntervalUnit(spec["period"])
        routed = stickiness_from_rollup(
            roll, time, period, _spec(), event, filters).toPandas()
        raw = stickiness(
            events, time, period=period, event=event,
            filters=filters).toPandas()
        _compare(routed, raw,
                 {"avg_dau", "period_active"},
                 f"stickiness seed={spec['seed']}",
                 ratio_cols={"stickiness"})
    else:
        interval = TimeIntervalUnit(spec["cohort_interval"])
        routed = cohort_sizes_from_rollup(
            roll, time, interval, _spec(), event, filters).toPandas()
        _, sizes = _cohorts_and_sizes(
            events, event, time, interval, filters, "user_id")
        _compare(routed, sizes.toPandas(), {"cohort_size"},
                 f"cohort seed={spec['seed']}")
    return {"routed": True}


def _check_maintenance(spark, sf_dir: str, spec: dict) -> dict:
    """recompute_days after an erasure ≡ full rebuild of the
    post-erasure lake — at the store surface (all mergeable columns +
    sketch estimates) and through a routed stickiness query."""
    from optiprism_spark.rollup import (
        ROLLUP_DT_COL,
        USERS_HLL_COL,
        RollupStore,
        build_rollup,
        stickiness_from_rollup,
    )
    from optiprism_spark.schema import load_table

    events = load_table(spark, sf_dir, "events")
    if spec["erase_kind"] == "user":
        victims = (
            events.select("user_id").distinct()
            .orderBy("user_id").limit(spec["victim"] + 1)
            .orderBy(F.desc("user_id")).limit(1).collect()
        )
        victim = victims[0][0]
        post = events.filter(F.col("user_id") != victim)
        days = [
            r[0] for r in events.filter(F.col("user_id") == victim)
            .select(F.to_date("ts")).distinct().collect()
        ]
    else:
        day = spec["day"]
        post = events.filter(F.to_date("ts") != F.lit(day.isoformat()))
        days = [day]
    tmp = tempfile.mkdtemp(prefix="fuzz_rollup_")
    try:
        store = RollupStore(f"{tmp}/store", _spec())
        store.rebuild(spark, events)
        store.recompute_days(spark, post, days)
        maintained = store.read(spark)
        rebuilt = build_rollup(post, _spec())
        surf = lambda df: df.select(  # noqa: E731
            ROLLUP_DT_COL,
            *_spec().all_dim_names,
            "events_count", "value_sum", "value_min", "value_max",
            "value_cnt",
            F.hll_sketch_estimate(F.col(USERS_HLL_COL)).alias("__uest"),
        ).toPandas()
        _compare(surf(maintained), surf(rebuilt), set(),
                 f"maintenance store seed={spec['seed']}")
        time = QueryTime.between(
            dt.datetime(2024, 1, 1),
            dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
        _compare(
            stickiness_from_rollup(
                maintained, time, TimeIntervalUnit.WEEK, _spec()).toPandas(),
            stickiness_from_rollup(
                rebuilt, time, TimeIntervalUnit.WEEK, _spec()).toPandas(),
            set(), f"maintenance routed seed={spec['seed']}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"routed": True}
