"""Funnel oracle suite.

Operators over the driver events table (signup → view → purchase):

- ``funnel_first_touch_3step``: declarative first-touch funnel with an
  exact DuckDB oracle (chained min-timestamp joins).
- ``funnel_machine_*``: the reference-exact greedy state machine.
  For EXACT-order steps the machine is SQL-expressible after all: each
  attempt is fully determined by its anchor (step-0 row), and the
  anchor chain advances deterministically — so a recursive CTE over
  ANCHORS (a handful per user, not one per row) replays the machine.
  ``_machine_oracle_sql`` below generates that oracle for every
  registered variant — 3step/nonunique/dropoff/excludes plus the
  any-order, holding-constants and session-mode axes (each extends
  the anchor chain: any-order tracks a step *set*, constants pin the
  anchor's property value down the chain, session mode derives its
  window from the sessionize gap). All funnel queries here carry
  DuckDB oracles (``len(ORACLE_SQL) == len(QUERIES)`` for this
  suite); the scripted-trace tests in tests/test_funnel.py pin the
  kernel's per-row semantics independently (the same two-layer
  strategy the reference uses, SURVEY §5).

Machine facts the oracle encodes (reference funnel.rs:457-660 and the
kernel in operators/funnel.py):

- greedy: the anchor is the FIRST step-0 row; later step-0 rows are
  skipped while an attempt is in flight.
- window expiry flushes the attempt at the first STEP row with
  ``ts > t0 + W`` (exclude rows never trigger expiry — the exclude
  check precedes the window check and aborts instead); the next
  anchor is therefore the first step-0 row with ``ts > t0 + W``.
- completion: next anchor is the first step-0 row after the
  completing row; Unique count-mode stops the user at the first
  COMPLETION flush whose filter-completed flag is true (expiry/end
  flushes never stop the user — so with a drop-off filter a Unique
  funnel never stops, and its attempt set equals NonUnique's).
- an exclude row mid-attempt ABORTS without recording (reference
  resets with ``continue`` before push_result); the attempt exists in
  the output only if no exclude row precedes its end row.
- every recorded attempt increments bucket counters regardless of the
  drop-off filter (push_result, funnel.rs:216-233 — the filter only
  feeds the Unique-skip decision).
"""

from __future__ import annotations

import datetime as dt

from ..dsl import (
    EventFilterSpec,
    EventRef,
    FunnelCountMode,
    FunnelExclude,
    FunnelFilter,
    FunnelRequest,
    FunnelStep,
    FunnelTouch,
    PropertyRef,
    QueryTime,
    StepOrder,
    TimeIntervalUnit,
)
from ..operators.funnel import funnel_report
from ..operators.funnel_df import funnel_first_touch_report
from ..registry import query
from ..schema import load_table
from . import _sql as S

_WINDOW_MS = 7 * 86400 * 1000
_W_US = _WINDOW_MS * 1000

_STEP_ETS = (("signup",), ("view",), ("purchase",))


def _in(ets) -> str:
    return "(" + ", ".join(f"'{e}'" for e in ets) + ")"


#: session count-mode gap, µs — the engine-wide constant
from ..streaming.sessionize import SESSION_GAP_US as _SESSION_GAP_US


def _attempt_lateral(anchor: str, exclude_ets, step_ets=_STEP_ETS,
                     const_key=None, session=False, breakdown=False,
                     window_us: int = _W_US) -> str:
    """Attempt outcome for one anchor row (user_id[, sess], t0, e0
    [, k0]): first step-1 row after the anchor (s1), first step-2 row
    after that (s2), first aborting row (x: exclude event, or any row
    whose holding-constant deviates from the anchor's k0), first
    beyond-window flush-trigger row (y), then the machine's step count
    + abort flag. The abort comparison vs the completed step is <=
    because the reference's reset ``continue`` REPROCESSES the
    violating row at step 0 — a row can't both abort and complete.
    Mid-funnel check order is exclude → WINDOW → constants → step
    (funnel.rs:544-605: the out-of-window branch push_results and
    resets WITHOUT ``continue``, then the same row falls through to
    the constants block at cur_step 0 where it only seeds const_row).
    Hence the x-vs-y tie differs by abort kind: an exclude row that is
    also the first beyond-window row still aborts (exclude checked
    first → <=), but a constant-deviating row there does NOT — the
    flush already recorded the attempt (strict <). Found by the
    funnel DSL fuzzer (tests/_fuzz_funnel.py) at window=1d."""
    corr = f"e.user_id = {anchor}.user_id"
    if session:
        corr += f" AND e.sess = {anchor}.sess"
    if breakdown:
        # the machine runs per (user, breakdown-value); NULL is its own group
        corr += f" AND e.bd IS NOT DISTINCT FROM {anchor}.bd"
    full_stream = const_key is not None or session
    #: which rows can trigger a window-expiry flush: with a pre-filtered
    #: kernel input only step rows exist; in full-stream modes ANY
    #: non-aborting row does (the abort check precedes the window check,
    #: so x-rows abort instead — position comparison handles that)
    y_et = "" if full_stream else f" AND e.et IN {_in(sorted({t for st in step_ets for t in st}))}"
    x_lat, x_sel, abort_expr = "", "NULL AS xts, NULL AS xeid,", "FALSE"
    x_pred = None
    if exclude_ets:
        x_pred = f"e.et IN {_in(exclude_ets)}"
    elif const_key is not None:
        x_pred = f"e.kv IS DISTINCT FROM {anchor}.k0"
    if x_pred:
        x_lat = f"""
    LEFT JOIN LATERAL (
      SELECT e.ts AS xts, e.eid AS xeid FROM e
      WHERE {corr} AND {x_pred}
        AND (e.ts, e.eid) > ({anchor}.t0, {anchor}.e0)
      ORDER BY e.ts, e.eid LIMIT 1) x ON TRUE"""
        x_sel = "x.xts, x.xeid,"
        # see docstring: exclude beats the window flush (<=), the
        # window flush beats a constants violation (strict <)
        y_cmp = "<=" if exclude_ets else "<"
        abort_expr = f"""(x.xts IS NOT NULL AND
             CASE WHEN s1.ts1 IS NOT NULL AND s1.ts1 - {anchor}.t0 <= {window_us}
                       AND s2.ts2 IS NOT NULL AND s2.ts2 - {anchor}.t0 <= {window_us}
                  THEN (x.xts, x.xeid) <= (s2.ts2, s2.eid2)
                  WHEN y.yts IS NOT NULL THEN (x.xts, x.xeid) {y_cmp} (y.yts, y.yeid)
                  ELSE TRUE END)"""
    return f"""
  CROSS JOIN LATERAL (
    SELECT s1.ts1, s1.eid1, s2.ts2, s2.eid2, {x_sel}
           CASE WHEN s1.ts1 IS NOT NULL AND s1.ts1 - {anchor}.t0 <= {window_us}
                THEN CASE WHEN s2.ts2 IS NOT NULL AND s2.ts2 - {anchor}.t0 <= {window_us}
                          THEN 3 ELSE 2 END
                ELSE 1 END AS sc,
           {abort_expr} AS aborted
    FROM (SELECT 1 AS one) d
    LEFT JOIN LATERAL (
      SELECT e.ts AS ts1, e.eid AS eid1 FROM e
      WHERE {corr} AND e.et IN {_in(step_ets[1])}
        AND (e.ts, e.eid) > ({anchor}.t0, {anchor}.e0)
      ORDER BY e.ts, e.eid LIMIT 1) s1 ON TRUE
    LEFT JOIN LATERAL (
      SELECT e.ts AS ts2, e.eid AS eid2 FROM e
      WHERE {corr} AND e.et IN {_in(step_ets[2])}
        AND s1.ts1 IS NOT NULL AND s1.ts1 - {anchor}.t0 <= {window_us}
        AND (e.ts, e.eid) > (s1.ts1, s1.eid1)
      ORDER BY e.ts, e.eid LIMIT 1) s2 ON TRUE{x_lat}
    LEFT JOIN LATERAL (
      SELECT e.ts AS yts, e.eid AS yeid FROM e
      WHERE {corr}{y_et}
        AND (e.ts, e.eid) > ({anchor}.t0, {anchor}.e0) AND e.ts > {anchor}.t0 + {window_us}
      ORDER BY e.ts, e.eid LIMIT 1) y ON TRUE
  ) a
"""


def _machine_chain_sql(stop_cond: str, exclude_ets=(), step_ets=_STEP_ETS,
                       const_key=None, session: bool = False,
                       breakdown_key=None, extra_pred: str = "",
                       window_us: int = _W_US, time=S.T_FULL) -> str:
    """Recursive anchor chain replaying the greedy machine: one row per
    recorded attempt (user_id, t0, ts1, ts2, sc). ``stop_cond`` is a
    predicate on the previous attempt row ``p`` that ends the user's
    chain (Unique-mode skip). ``const_key``: holding-constant JSON key
    — anchors carry their own k0, any later row with a deviating value
    aborts. ``session``: the machine runs per (user, 30-min-gap
    session) instead of per user. ``breakdown_key``: JSON key whose
    value sub-partitions the machine (one independent run per
    (user, value), NULL being its own group — mirroring the kernel's
    groupby(dropna=False)). ``extra_pred``: extra " AND ..." clause on
    the event stream (e.g. the estimation suite's user-sample
    predicate)."""
    assert not (exclude_ets and const_key), "not combined in any query"
    breakdown = breakdown_key is not None
    full_stream = const_key is not None or session
    if full_stream:
        et_filter = extra_pred
    else:
        all_ets = sorted({t for st in step_ets for t in st} | set(exclude_ets))
        et_filter = f" AND event_type IN {_in(all_ets)}{extra_pred}"
    kv_sel = (
        f", CAST(json_extract_string(props, '$.{const_key}') AS BIGINT) AS kv"
        if const_key is not None else ""
    )
    bd_sel = (
        f", CAST(json_extract_string(props, '$.{breakdown_key}') AS BIGINT) AS bd"
        if breakdown else ""
    )
    #: partition columns of the machine run, beyond user_id
    extra_part = (["sess"] if session else []) + (["bd"] if breakdown else [])
    part = ", ".join(["user_id"] + extra_part)
    if session:
        e_cte = f"""e AS (
  SELECT user_id, ts, eid, et{', kv' if const_key else ''}{', bd' if breakdown else ''},
         SUM(CASE WHEN prev_ts IS NOT NULL AND ts - prev_ts > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, eid
                 ROWS UNBOUNDED PRECEDING) AS sess
  FROM (
    SELECT user_id, epoch_us(ts) AS ts, event_id AS eid, event_type AS et{kv_sel}{bd_sel},
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev_ts
    FROM events WHERE {S.ts_between(*time)}{et_filter}) raw
)"""
    else:
        e_cte = f"""e AS (
  SELECT user_id, epoch_us(ts) AS ts, event_id AS eid, event_type AS et{kv_sel}{bd_sel}
  FROM events
  WHERE {S.ts_between(*time)}{et_filter}
)"""
    anchor_cols = ["user_id"] + extra_part + ["t0", "e0"] \
        + (["k0"] if const_key else [])
    a_cols = ", ".join(anchor_cols)
    extra_sel = "".join(f", {c}" for c in extra_part)
    k0_sel = ", kv AS k0" if const_key else ""
    p_extra = "".join(f", p.{c}" for c in extra_part)
    e_extra = "".join(f", e.{c}" for c in extra_part)
    next_corr = "e.user_id = p.user_id"
    if session:
        next_corr += " AND e.sess = p.sess"
    if breakdown:
        next_corr += " AND e.bd IS NOT DISTINCT FROM p.bd"
    lat = lambda a: _attempt_lateral(a, exclude_ets, step_ets, const_key,
                                     session, breakdown, window_us=window_us)
    chain = f"""
WITH RECURSIVE
{e_cte},
first_anchor AS (
  SELECT {a_cols} FROM (
    SELECT user_id{extra_sel}, ts AS t0, eid AS e0{k0_sel},
           ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY ts, eid) AS rn
    FROM e WHERE et IN {_in(step_ets[0])}) t WHERE rn = 1
),
chain AS (
  SELECT {', '.join('c.' + c for c in anchor_cols)}, a.*
  FROM first_anchor c
  {lat('c')}
  UNION ALL
  SELECT {', '.join('n.' + c for c in anchor_cols)}, a.*
  FROM (
    SELECT p.user_id{p_extra},
           CASE WHEN p.aborted THEN p.xts
                WHEN p.sc = 3 THEN p.ts2 ELSE NULL END AS after_ts,
           CASE WHEN p.aborted THEN p.xeid
                WHEN p.sc = 3 THEN p.eid2 ELSE NULL END AS after_eid,
           p.aborted AS was_aborted,
           CASE WHEN p.aborted OR p.sc = 3 THEN NULL ELSE p.t0 + {window_us} END AS min_ts
    FROM chain p WHERE NOT ({stop_cond})
  ) p
  CROSS JOIN LATERAL (
    SELECT e.user_id{e_extra}, e.ts AS t0, e.eid AS e0{k0_sel}
    FROM e
    WHERE {next_corr}
      AND e.et IN {_in(step_ets[0])}
      AND ((p.after_ts IS NOT NULL AND p.was_aborted
            AND (e.ts, e.eid) >= (p.after_ts, p.after_eid))
           OR (p.after_ts IS NOT NULL AND NOT p.was_aborted
               AND (e.ts, e.eid) > (p.after_ts, p.after_eid))
           OR (p.min_ts IS NOT NULL AND e.ts > p.min_ts))
    ORDER BY e.ts, e.eid LIMIT 1
  ) n
  {lat('n')}
)
SELECT * FROM chain WHERE NOT aborted"""
    return chain


def _cnt(i: int) -> str:
    return f"SUM(CASE WHEN sc > {i} THEN 1 ELSE 0 END)"


def _step_metric_parts() -> list[str]:
    """The per-step metric block shared by every report-shaped oracle
    (mirrors operators/funnel._report_from_attempts)."""
    parts = [
        f"CAST({_cnt(0)} AS BIGINT) AS step0_total",
        "CAST(100.0 AS DOUBLE) AS step0_conversion_ratio",
    ]
    for i in (1, 2):
        prev_ts = "t0" if i == 1 else "ts1"
        ratio = f"(CAST({_cnt(i)} AS DOUBLE) / CAST({_cnt(0)} AS DOUBLE) * 100)"
        ttc = f"(SUM(CASE WHEN sc > {i} THEN ts{i} - {prev_ts} END) / 1000.0)"
        fs = f"(SUM(CASE WHEN sc > {i} THEN ts{i} - t0 END) / 1000.0)"
        parts += [
            f"CAST({_cnt(i)} AS BIGINT) AS step{i}_total",
            f"{ratio} AS step{i}_conversion_ratio",
            f"CAST({_cnt(i-1)} - {_cnt(i)} AS BIGINT) AS step{i}_dropped_off",
            f"(CAST(100.0 AS DOUBLE) - {ratio}) AS step{i}_drop_off_ratio",
            f"{ttc} AS step{i}_time_to_convert",
            f"CASE WHEN {_cnt(i)} > 0 THEN {ttc} / {_cnt(i)}"
            f" ELSE CAST(0.0 AS DOUBLE) END AS step{i}_avg_time_to_convert",
            f"{fs} AS step{i}_time_to_convert_from_start",
            f"CASE WHEN {_cnt(i)} > 0 THEN {fs} / {_cnt(i)}"
            f" ELSE CAST(0.0 AS DOUBLE) END AS step{i}_avg_time_to_convert_from_start",
        ]
    parts += [
        f"CAST({_cnt(0)} AS BIGINT) AS total",
        f"CAST({_cnt(2)} AS BIGINT) AS completed",
    ]
    return parts


def _machine_oracle_sql(stop_cond: str, exclude_ets=(), step_ets=_STEP_ETS,
                        touch: str = "first", const_key=None,
                        session: bool = False, breakdown_key=None,
                        extra_pred: str = "", window_us: int = _W_US,
                        time=S.T_FULL) -> str:
    """ConversionOverTime report oracle: anchor chain → per-day bucket
    report with the exact column names/types funnel_report emits.
    ``touch`` picks the bucket-attribution timestamp (first | last)."""
    chain = _machine_chain_sql(stop_cond, exclude_ets, step_ets, const_key,
                               session, breakdown_key, extra_pred,
                               window_us=window_us, time=time)
    attr = (
        "t0" if touch == "first"
        else "(CASE WHEN sc = 1 THEN t0 WHEN sc = 2 THEN ts1 ELSE ts2 END)"
    )
    keys = [f"CAST(date_trunc('day', make_timestamp({attr})) AS DATE) AS bucket"]
    group = "1"
    if breakdown_key is not None:
        keys.append(f"bd AS {breakdown_key}")
        group = "1, 2"
    parts = keys + _step_metric_parts()
    return (
        f"WITH ch AS ({chain}) SELECT " + ", ".join(parts)
        + f" FROM ch GROUP BY {group}"
    )


def _req(**kw):
    defaults = dict(
        time=QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59)),
        interval=TimeIntervalUnit.DAY,
        steps=[
            FunnelStep([EventFilterSpec(EventRef("signup"))]),
            FunnelStep([EventFilterSpec(EventRef("view"))]),
            FunnelStep([EventFilterSpec(EventRef("purchase"))]),
        ],
        window_ms=_WINDOW_MS,
    )
    defaults.update(kw)
    return FunnelRequest(**defaults)


@query(
    "funnel_first_touch_3step",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_type FROM events WHERE {S.ts_between(*S.T_FULL)}
    ),
    s0 AS (SELECT user_id, MIN(ts) AS t0 FROM e WHERE event_type = 'signup' GROUP BY 1),
    s1 AS (
      SELECT s0.user_id, MIN(e.ts) AS t1
      FROM s0 JOIN e ON e.user_id = s0.user_id AND e.event_type = 'view'
        AND e.ts > s0.t0 AND e.ts <= s0.t0 + INTERVAL 7 DAY
      GROUP BY 1
    ),
    s2 AS (
      SELECT s1.user_id, MIN(e.ts) AS t2
      FROM s1
      JOIN s0 ON s0.user_id = s1.user_id
      JOIN e ON e.user_id = s1.user_id AND e.event_type = 'purchase'
        AND e.ts > s1.t1 AND e.ts <= s0.t0 + INTERVAL 7 DAY
      GROUP BY 1
    ),
    u AS (
      SELECT s0.user_id, t0, t1, t2
      FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    )
    SELECT CAST(date_trunc('day', t0) AS DATE) AS bucket,
           COUNT(*) AS step0_total,
           COUNT(t1) AS step1_total,
           COUNT(t2) AS step2_total,
           CAST(COUNT(t2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 100 AS conversion_ratio,
           CASE WHEN COUNT(t2) > 0 THEN
             (CAST(SUM(CASE WHEN t2 IS NOT NULL
                            THEN date_diff('microsecond', t0, t2) END) AS DOUBLE) / 1e6)
             / CAST(COUNT(t2) AS DOUBLE)
           END AS avg_secs_to_convert
    FROM u GROUP BY 1
    """,
)
def funnel_first_touch_3step(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return funnel_first_touch_report(events, _req())


@query("funnel_machine_3step", oracle=_machine_oracle_sql("p.sc = 3"))
def funnel_machine_3step(spark, sf_dir):
    """Unique count-mode: the chain stops at the first completed
    attempt (reference skip_partition, funnel.rs:630-637)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req())


@query("funnel_machine_nonunique", oracle=_machine_oracle_sql("FALSE"))
def funnel_machine_nonunique(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(count_mode=FunnelCountMode.NON_UNIQUE))


@query(
    "funnel_machine_excludes",
    oracle=_machine_oracle_sql("p.sc = 3 AND NOT p.aborted", exclude_ets=("error",)),
)
def funnel_machine_excludes(spark, sf_dir):
    """Excludes: an `error` event between any steps resets the attempt
    without recording it (reference funnel.rs:544-556)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(
        events,
        _req(excludes=[FunnelExclude(EventFilterSpec(EventRef("error")))]),
    )


@query("funnel_machine_dropoff_step1", oracle=_machine_oracle_sql("FALSE"))
def funnel_machine_dropoff_step1(spark, sf_dir):
    """Drop-off filter: only attempts that stalled exactly after the
    `view` step count as completed=true (reference
    FunnelFilter::DropOffOnStep, mod.rs:69-76). The filter gates ONLY
    the Unique-skip decision, which fires at completion flushes alone —
    a full conversion fails the drop-off filter, so the user is never
    skipped and the attempt set equals NonUnique's (push_result,
    funnel.rs:216-233)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(filter=FunnelFilter("drop_off_on_step", step=1)))


@query(
    "funnel_machine_constants",
    # the anchor carries its own k; ANY later row with a deviating k
    # aborts the attempt unrecorded, and the aborting row itself is
    # reprocessed as a potential new anchor (reference resets with
    # `continue`, funnel.rs:585-596)
    oracle=_machine_oracle_sql("p.sc = 3 AND NOT p.aborted", const_key="k"),
)
def funnel_machine_constants(spark, sf_dir):
    """Holding constant: the `k` JSON property must keep one value
    across all steps of an attempt (reference Group::check_constants,
    funnel.rs:167-178)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(constants=[PropertyRef.json("k", "int64")]))


@query(
    "funnel_machine_any_order_touch_last",
    # both any-order steps accept view|click, so the anchor chain still
    # replays the machine; touch=last re-attributes the bucket to the
    # last completed step's timestamp
    oracle=_machine_oracle_sql(
        "p.sc = 3",
        step_ets=(("signup",), ("view", "click"), ("view", "click")),
        touch="last",
    ),
)
def funnel_machine_any_order_touch_last(spark, sf_dir):
    """Any-order middle steps + last-touch bucket attribution
    (reference StepOrder::Any + Touch::Last)."""
    events = load_table(spark, sf_dir, "events")
    any_steps = [
        FunnelStep([EventFilterSpec(EventRef("signup"))]),
        FunnelStep(
            [EventFilterSpec(EventRef("view")), EventFilterSpec(EventRef("click"))],
            order=StepOrder.ANY, any_ranges=[(1, 2)],
        ),
        FunnelStep(
            [EventFilterSpec(EventRef("view")), EventFilterSpec(EventRef("click"))],
            order=StepOrder.ANY, any_ranges=[(1, 2)],
        ),
    ]
    return funnel_report(events, _req(steps=any_steps, touch=FunnelTouch.LAST))


@query("api_json_funnel", oracle=_machine_oracle_sql("p.sc = 3"))
def api_json_funnel(spark, sf_dir):
    """A reference-shaped camelCase funnel request body (reference
    platform/src/funnel.rs:293-640) parsed by api.py and executed by
    the machine — end-to-end JSON → funnel_report parity. The payload
    mirrors the 3-step unique funnel, so the recursive-anchor oracle
    applies unchanged."""
    from ..api import parse_funnel

    body = {
        "time": {"type": "between", "from": "2024-01-01T00:00:00",
                 "to": "2024-01-31T23:59:59"},
        "group": "user",
        "steps": [
            {"events": [{"eventName": "signup", "eventType": "regular"}],
             "order": {"type": "exact"}},
            {"events": [{"eventName": "view", "eventType": "regular"}],
             "order": {"type": "exact"}},
            {"events": [{"eventName": "purchase", "eventType": "regular"}],
             "order": {"type": "exact"}},
        ],
        "timeWindow": {"n": 7, "unit": "day"},
        "chartType": "line",
        "count": "unique",
    }
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, parse_funnel(body))


@query(
    "funnel_machine_breakdown",
    # the machine runs once per (user, breakdown value): bd joins the
    # chain's partition key, then the report groups by (bucket, bd)
    oracle=_machine_oracle_sql("p.sc = 3", breakdown_key="k"),
)
def funnel_machine_breakdown(spark, sf_dir):
    """Breakdown funnel: one independent machine per (user, props.k)
    group, report keyed by (bucket, k) — reference Groups/breakdowns
    axis (funnel.rs Groups row-encoding, SURVEY §2.5)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(breakdowns=[PropertyRef.json("k", "int64")]))


_STEPS_CHART_ORACLE = (
    f"WITH ch AS ({_machine_chain_sql('p.sc = 3')}) SELECT "
    + ", ".join(_step_metric_parts())
    + " FROM ch"
)

_TTC_INTERVAL_MS = 3_600_000  # 1-hour bins
_TTC_DIST_ORACLE = f"""
WITH ch AS ({_machine_chain_sql('FALSE')})
SELECT GREATEST(CAST(0 AS BIGINT),
                LEAST(CAST({_WINDOW_MS // _TTC_INTERVAL_MS + 1} AS BIGINT),
                      (ts2 - t0) // {_TTC_INTERVAL_MS * 1000})) AS bin,
       COUNT(*) AS n_conversions
FROM ch WHERE sc = 3 GROUP BY 1
"""

_TTC_PCTL_ORACLE = f"""
WITH ch AS ({_machine_chain_sql('FALSE')}),
durs AS (
  SELECT CAST(1 AS INT) AS step, ts1 - t0 AS dur_us FROM ch WHERE sc = 3
  UNION ALL
  SELECT CAST(2 AS INT) AS step, ts2 - t0 AS dur_us FROM ch WHERE sc = 3
)
SELECT step, COUNT(*) AS n_conversions,
       quantile_cont(dur_us, 0.5) AS p50_us,
       quantile_cont(dur_us, 0.9) AS p90_us,
       MAX(dur_us) AS max_us
FROM durs GROUP BY 1
"""

_FREQUENCY_ORACLE = f"""
WITH ch AS ({_machine_chain_sql('FALSE')}),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN sc = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_conversions
  FROM ch GROUP BY 1
)
SELECT n_conversions, COUNT(*) AS n_users FROM per_user GROUP BY 1
"""


@query("funnel_steps_chart", oracle=_STEPS_CHART_ORACLE)
def funnel_steps_chart(spark, sf_dir):
    """Steps chart: bucketless global per-step totals (reference
    ChartType::Steps → time_interval None, common/src/funnel.rs:146-153)."""
    from ..operators.funnel import funnel_steps_report

    events = load_table(spark, sf_dir, "events")
    return funnel_steps_report(events, _req())


@query("funnel_time_to_convert_dist", oracle=_TTC_DIST_ORACLE)
def funnel_time_to_convert_dist(spark, sf_dir):
    """TimeToConvert chart: histogram of completed conversions by
    duration in 1-hour bins (reference ChartType::TimeToConvert,
    common/src/funnel.rs:139-144 — declared there, assembled here).
    NonUnique so every conversion contributes to the distribution."""
    from ..operators.funnel import funnel_time_to_convert_dist as ttc

    events = load_table(spark, sf_dir, "events")
    return ttc(
        events,
        _req(count_mode=FunnelCountMode.NON_UNIQUE),
        interval_ms=_TTC_INTERVAL_MS,
    )


@query("funnel_ttc_percentiles", oracle=_TTC_PCTL_ORACLE)
def funnel_ttc_percentiles(spark, sf_dir):
    """Per-step time-to-convert summary — the "median time to
    purchase" header over the TimeToConvert chart's attempt frame:
    exact integer-µs durations per completed attempt, interpolated
    p50/p90 + max per step (NonUnique, like the histogram)."""
    from ..operators.funnel import funnel_ttc_percentiles as ttcp

    events = load_table(spark, sf_dir, "events")
    return ttcp(events, _req(count_mode=FunnelCountMode.NON_UNIQUE))


@query("funnel_frequency", oracle=_FREQUENCY_ORACLE)
def funnel_frequency(spark, sf_dir):
    """Frequency chart: users by number of completed conversions
    (reference ChartType::Frequency, common/src/funnel.rs:144 —
    declared there, assembled here)."""
    from ..operators.funnel import funnel_frequency as freq

    events = load_table(spark, sf_dir, "events")
    return freq(events, _req())


@query(
    "funnel_machine_session_mode",
    # same chain, partitioned by (user, 30-min-gap session); Session
    # count-mode never unique-skips
    oracle=_machine_oracle_sql("FALSE", session=True),
)
def funnel_machine_session_mode(spark, sf_dir):
    """Session count mode: the state machine runs per (user, 30-min
    session) — declared in the reference DSL but `unimplemented!`
    there (common/src/funnel.rs:60-70); implemented here."""
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, _req(count_mode=FunnelCountMode.SESSION))
