"""Differential fuzzer for the funnel JSON DSL.

Random-but-seeded funnel request bodies — 3 steps with 1-2 event
types each (multi-type steps are OR, reference multi-event steps),
random conversion windows, random full-day time sub-ranges, one
structural mode per seed (round-robin: unique / non-unique / excludes
/ holding-constants / breakdown / session count-mode / last-touch /
drop-off filters) —
executed through the REAL serving path (api.parse_funnel →
operators.funnel.funnel_report) and compared hash-exact against the
recursive-anchor-chain DuckDB oracle (suites/funnel._machine_oracle_
sql), which replays the greedy machine in pure SQL.

The oracle generator is shared with the registered funnel queries but
parameterized per spec (window_us, time, step_ets, ...) — the fuzzer
explores the space around the enumerated points the driver gate pins.
"""

from __future__ import annotations

import random

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
#: one structural mode per seed, round-robin so every mode gets
#: coverage at any sweep size
MODES = ("unique", "nonunique", "excludes", "constants", "breakdown",
         "session", "touch_last", "dropoff")
#: (n, unit) conversion windows; api._WINDOW_MS units
WINDOWS = ((30, "minute"), (2, "hour"), (6, "hour"), (12, "hour"),
           (1, "day"), (3, "day"), (7, "day"))
_UNIT_MS = {"minute": 60_000, "hour": 3_600_000, "day": 86_400_000}


def gen_spec(seed: int) -> dict:
    rng = random.Random(0xF0_0000 + seed)  # decorrelated from the seg fuzzer
    mode = MODES[seed % len(MODES)]

    if mode == "excludes":
        # steps must stay disjoint from the exclude set
        pool = rng.sample(EVENT_TYPES, 4)
        steps = [(pool[0],), (pool[1],), (pool[2],)]
        excludes = (pool[3],)
    else:
        steps = []
        for _ in range(3):
            n = 1 if rng.random() < 0.7 else 2
            steps.append(tuple(sorted(rng.sample(EVENT_TYPES, n))))
        excludes = ()

    win_n, win_unit = WINDOWS[rng.randrange(len(WINDOWS))]
    d0 = rng.randint(1, 20)
    d1 = rng.randint(d0, 30)
    # dropoff filter: gates ONLY the Unique-skip decision, which fires
    # at completion flushes alone (sc == k). is_completed under
    # dropOffOnStep s is (sc == s+1): for s < k-1 (and any-step) a
    # full conversion fails it → attempts equal NonUnique's; for
    # s == k-1 it SATISFIES it → the skip fires and attempts equal
    # Unique's (the fuzzer's first dropoff sweep caught this)
    dropoff = (rng.choice(("any", 0, 1, 2)) if mode == "dropoff" else None)
    return {
        "seed": seed, "mode": mode, "steps": steps, "excludes": excludes,
        "win_n": win_n, "win_unit": win_unit, "d0": d0, "d1": d1,
        "dropoff": dropoff,
    }


def spec_to_body(s: dict) -> dict:
    body = {
        "time": {"type": "between",
                 "from": f"2024-01-{s['d0']:02d}T00:00:00",
                 "to": f"2024-01-{s['d1']:02d}T23:59:59"},
        "group": "user",
        "steps": [
            {"events": [{"eventName": t, "eventType": "regular"}
                        for t in st],
             "order": {"type": "exact"}}
            for st in s["steps"]
        ],
        "timeWindow": {"n": s["win_n"], "unit": s["win_unit"]},
        "chartType": "line",
        "count": "nonUnique" if s["mode"] == "nonunique"
                 else "session" if s["mode"] == "session" else "unique",
    }
    if s["mode"] == "excludes":
        body["exclude"] = [{"eventName": t, "eventType": "regular"}
                           for t in s["excludes"]]
    elif s["mode"] == "constants":
        body["holdingConstants"] = [{"propertyType": "event",
                                     "propertyName": "k", "dtype": "int64"}]
    elif s["mode"] == "breakdown":
        body["breakdowns"] = [{"propertyType": "event",
                               "propertyName": "k", "dtype": "int64"}]
    elif s["mode"] == "touch_last":
        body["touch"] = {"type": "last"}
    elif s["mode"] == "dropoff":
        body["filter"] = ({"type": "dropOffOnAnyStep"}
                          if s["dropoff"] == "any"
                          else {"type": "dropOffOnStep", "step": s["dropoff"]})
    return body


def spec_to_sql(s: dict) -> str:
    # import the registry first: suites.funnel imported directly would
    # re-enter via registry -> suites.estimate -> funnel half-initialized
    import optiprism_spark.registry  # noqa: F401
    from optiprism_spark.suites.funnel import _machine_oracle_sql

    mode = s["mode"]
    if mode == "dropoff":
        # is_completed under dropOffOnStep s is (sc == s+1), and the
        # Unique-skip fires at completion flushes alone (sc == k): for
        # s == k-1 a full conversion SATISFIES the filter and the skip
        # fires (unique attempt set); for s < k-1 and for any-step it
        # never does (non-unique attempt set)
        stop = "p.sc = 3" if s["dropoff"] == 2 else "FALSE"
    elif mode in ("nonunique", "session"):
        stop = "FALSE"
    elif mode in ("excludes", "constants"):
        # unique-skip only fires on completed UNABORTED attempts
        stop = "p.sc = 3 AND NOT p.aborted"
    else:
        stop = "p.sc = 3"
    return _machine_oracle_sql(
        stop,
        exclude_ets=s["excludes"],
        step_ets=tuple(s["steps"]),
        touch="last" if mode == "touch_last" else "first",
        const_key="k" if mode == "constants" else None,
        session=(mode == "session"),
        breakdown_key="k" if mode == "breakdown" else None,
        window_us=s["win_n"] * _UNIT_MS[s["win_unit"]] * 1000,
        time=(f"2024-01-{s['d0']:02d} 00:00:00",
              f"2024-01-{s['d1']:02d} 23:59:59"),
    )


def run_spec(spark, sf_dir: str, spec: dict):
    from optiprism_spark.api import parse_funnel
    from optiprism_spark.operators.funnel import funnel_report
    from optiprism_spark.schema import load_table

    req = parse_funnel(spec_to_body(spec))
    events = load_table(spark, sf_dir, "events")
    return funnel_report(events, req)
