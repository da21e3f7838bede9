"""Differential fuzzers for the paths, retention and attribution
operators.

Same pattern as _fuzz_seg/_fuzz_funnel: a seeded random spec drives
BOTH the Spark operator call and the DuckDB oracle generator the
registered suite queries use (suites/paths._paths_oracle /
_dropoff_oracle, suites/retention._oracle,
suites/attribution._oracle), parameterized by the spec's time range.
Exposed as suites: "paths", "retention", "attribution".
"""

from __future__ import annotations

import datetime as dt
import random

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
WITHIN_S = (None, 900, 1800, 3600, 7200, 14400)


def _time_range(rng: random.Random):
    d0 = rng.randint(1, 20)
    d1 = rng.randint(d0, 30)
    return d0, d1


def _qt(d0: int, d1: int):
    from optiprism_spark.dsl import QueryTime

    return QueryTime.between(dt.datetime(2024, 1, d0),
                             dt.datetime(2024, 1, d1, 23, 59, 59))


def _sql_time(d0: int, d1: int):
    return (f"2024-01-{d0:02d} 00:00:00", f"2024-01-{d1:02d} 23:59:59")


# ---------------------------------------------------------------- paths

class paths_suite:
    @staticmethod
    def gen_spec(seed: int) -> dict:
        rng = random.Random(0x9A7_0000 + seed)
        kind = "dropoff" if seed % 4 == 3 else "paths"
        anchor = rng.choice(EVENT_TYPES)
        exclude = ()
        if rng.random() < 0.3:
            pool = [t for t in EVENT_TYPES if t != anchor]
            exclude = (rng.choice(pool),)
        d0, d1 = _time_range(rng)
        return {
            "seed": seed, "kind": kind, "anchor": anchor,
            "steps": rng.randint(3, 5),
            "direction": rng.choice(("forward", "backward")),
            "within_s": rng.choice(WITHIN_S),
            "top_k": rng.choice((10, 15, 20, 25)),
            "exclude": exclude, "d0": d0, "d1": d1,
        }

    @staticmethod
    def spec_to_sql(s: dict) -> str:
        import optiprism_spark.registry  # noqa: F401 — break import cycle
        from optiprism_spark.suites.paths import _dropoff_oracle, _paths_oracle

        t = _sql_time(s["d0"], s["d1"])
        if s["kind"] == "dropoff":
            return _dropoff_oracle(s["anchor"], s["steps"], s["direction"],
                                   s["within_s"], exclude=s["exclude"], time=t)
        return _paths_oracle(s["anchor"], s["steps"], s["direction"],
                             s["within_s"], s["top_k"],
                             exclude=s["exclude"], time=t)

    @staticmethod
    def run_spec(spark, sf_dir: str, s: dict):
        from optiprism_spark.dsl import EventRef
        from optiprism_spark.operators.paths import event_paths, path_dropoff
        from optiprism_spark.schema import load_table

        events = load_table(spark, sf_dir, "events")
        within = (dt.timedelta(seconds=s["within_s"])
                  if s["within_s"] is not None else None)
        common = dict(anchor=EventRef(s["anchor"]), time=_qt(s["d0"], s["d1"]),
                      steps=s["steps"], direction=s["direction"],
                      within=within, exclude_events=s["exclude"])
        if s["kind"] == "dropoff":
            return path_dropoff(events, **common)
        return event_paths(events, top_k=s["top_k"], **common)


# ------------------------------------------------------------- retention

class retention_suite:
    @staticmethod
    def gen_spec(seed: int) -> dict:
        rng = random.Random(0x8E7_0000 + seed)
        d0, d1 = _time_range(rng)
        return {
            "seed": seed,
            "cohort_ev": rng.choice(EVENT_TYPES),
            "return_ev": rng.choice(EVENT_TYPES),
            "unit_days": rng.choice((1, 7)),
            "max_p": rng.randint(4, 12),
            "unbounded": seed % 3 == 2,
            "d0": d0, "d1": d1,
        }

    @staticmethod
    def spec_to_sql(s: dict) -> str:
        import optiprism_spark.registry  # noqa: F401 — break import cycle
        from optiprism_spark.suites.retention import _oracle

        return _oracle(s["cohort_ev"], s["return_ev"], s["unit_days"],
                       s["max_p"], unbounded=s["unbounded"],
                       time=_sql_time(s["d0"], s["d1"]))

    @staticmethod
    def run_spec(spark, sf_dir: str, s: dict):
        from optiprism_spark.dsl import EventRef, TimeIntervalUnit
        from optiprism_spark.operators.retention import retention
        from optiprism_spark.schema import load_table

        unit = (TimeIntervalUnit.DAY if s["unit_days"] == 1
                else TimeIntervalUnit.WEEK)
        return retention(
            load_table(spark, sf_dir, "events"),
            cohort_event=EventRef(s["cohort_ev"]),
            return_event=EventRef(s["return_ev"]),
            time=_qt(s["d0"], s["d1"]),
            interval=unit,
            max_periods=s["max_p"],
            unbounded=s["unbounded"],
        )


# ----------------------------------------------------------- attribution

class attribution_suite:
    @staticmethod
    def gen_spec(seed: int) -> dict:
        rng = random.Random(0xA77_0000 + seed)
        touches = tuple(sorted(rng.sample(EVENT_TYPES, rng.randint(1, 3))))
        conv = rng.choice([t for t in EVENT_TYPES if t not in touches])
        d0, d1 = _time_range(rng)
        return {
            "seed": seed, "touches": touches, "conv": conv,
            "model": rng.choice(("first_touch", "last_touch", "linear",
                                 "time_decay", "position")),
            "lookback_s": rng.choice((3600, 86400, 3 * 86400, 7 * 86400)),
            "half_life_s": rng.choice((3600, 43200, 86400, 2 * 86400)),
            "d0": d0, "d1": d1,
        }

    @staticmethod
    def spec_to_sql(s: dict) -> str:
        import optiprism_spark.registry  # noqa: F401 — break import cycle
        from optiprism_spark.suites.attribution import _frac_oracle, _oracle

        t = _sql_time(s["d0"], s["d1"])
        if s["model"] in ("first_touch", "last_touch"):
            order = ("t_ts ASC, t_id ASC" if s["model"] == "first_touch"
                     else "t_ts DESC, t_id DESC")
            return _oracle(order, touch_ets=s["touches"], conv_et=s["conv"],
                           lookback_s=s["lookback_s"], time=t)
        weight = {
            "linear": "1.0",
            "time_decay": (
                "greatest(1e-09, pow(0.5,"
                " CAST(epoch_us(c_ts) - epoch_us(t_ts) AS DOUBLE)"
                f" / {float(s.get('half_life_s', 86400)) * 1e6!r}))"),
            "position": ("CASE WHEN rn = 1 OR rn = k THEN 0.4"
                         " ELSE 0.2 / CAST(k - 2 AS DOUBLE) END"),
        }[s["model"]]
        return _frac_oracle(weight, touch_ets=s["touches"], conv_et=s["conv"],
                            lookback_s=s["lookback_s"], time=t)

    @staticmethod
    def run_spec(spark, sf_dir: str, s: dict):
        from pyspark.sql import functions as F

        from optiprism_spark.dsl import EventFilterSpec, EventRef
        from optiprism_spark.operators.attribution import attribution_report
        from optiprism_spark.schema import load_table

        touch = EventRef(custom=[EventFilterSpec(EventRef(t))
                                 for t in s["touches"]])
        return attribution_report(
            load_table(spark, sf_dir, "events"),
            channel_col=F.col("event_type"),
            touch_event=touch,
            conversion_event=EventRef(s["conv"]),
            time=_qt(s["d0"], s["d1"]),
            model=s["model"],
            lookback=dt.timedelta(seconds=s["lookback_s"]),
            half_life=dt.timedelta(seconds=s.get("half_life_s", 86400)),
        )


# ---------------------------------------------------------------- growth

class growth_suite:
    """Growth-accounting ledger vs its oracle over random periods and
    time windows (the churn cap and retained/resurrected boundaries
    are where off-by-one-bucket bugs would live)."""

    @staticmethod
    def gen_spec(seed: int) -> dict:
        rng = random.Random(0x6807_0000 + seed)
        d0, d1 = _time_range(rng)
        unit, step = rng.choice((("day", 1), ("week", 7)))
        event = rng.choice((None,) + EVENT_TYPES)
        return {"seed": seed, "unit": unit, "step": step,
                "event": event, "d0": d0, "d1": d1}

    @staticmethod
    def spec_to_sql(s: dict) -> str:
        import optiprism_spark.registry  # noqa: F401 — break import cycle
        from optiprism_spark.suites.engagement import _growth_oracle

        pred = (f" AND event_type = '{s['event']}'"
                if s.get("event") else "")
        return _growth_oracle(s["unit"], s["step"],
                              time=_sql_time(s["d0"], s["d1"]),
                              extra_pred=pred)

    @staticmethod
    def run_spec(spark, sf_dir: str, s: dict):
        from optiprism_spark.dsl import EventRef, TimeIntervalUnit
        from optiprism_spark.operators.engagement import growth_accounting
        from optiprism_spark.schema import load_table

        return growth_accounting(
            load_table(spark, sf_dir, "events"),
            _qt(s["d0"], s["d1"]),
            period=TimeIntervalUnit(s["unit"]),
            event=EventRef(s["event"]) if s.get("event") else None,
        )


# ------------------------------------------------------------------- rfm

class rfm_suite:
    """RFM scoring vs its oracle over random tile counts, windows and
    output shapes — percentile-edge ties and the inverted recency
    scale are where off-by-one-tile bugs would live."""

    @staticmethod
    def gen_spec(seed: int) -> dict:
        rng = random.Random(0x0F37_0000 + seed)
        d0, d1 = _time_range(rng)
        return {"seed": seed, "n_tiles": rng.choice((3, 4, 5, 6)),
                "grid": seed % 3 == 2, "d0": d0, "d1": d1,
                # r15: the regime switch rides the fuzz — "auto" must
                # resolve to the exact regime at oracle scale (below
                # sizing.EXACT_PERCENTILE_MAX_ROWS) and hash-match the
                # exact oracle just like mode="exact" does
                "percentile_mode": rng.choice(("auto", "exact"))}

    @staticmethod
    def spec_to_sql(s: dict) -> str:
        import optiprism_spark.registry  # noqa: F401 — break import cycle
        from optiprism_spark.suites.engagement import _rfm_oracle

        return _rfm_oracle(s["n_tiles"], time=_sql_time(s["d0"], s["d1"]),
                           grid=s["grid"])

    @staticmethod
    def run_spec(spark, sf_dir: str, s: dict):
        from pyspark.sql import functions as F

        from optiprism_spark.operators.aggregates import DECIMAL_T
        from optiprism_spark.operators.engagement import rfm_scores
        from optiprism_spark.schema import load_table

        out = rfm_scores(
            load_table(spark, sf_dir, "events"),
            _qt(s["d0"], s["d1"]), n_tiles=s["n_tiles"],
            percentile_mode=s.get("percentile_mode", "auto"))
        if not s["grid"]:
            return out
        return out.groupBy("r_score", "f_score", "m_score").agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("monetary").cast(DECIMAL_T)).cast("double")
            .alias("total_monetary"),
        )
