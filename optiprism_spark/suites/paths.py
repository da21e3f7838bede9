"""Path / journey-analysis oracle suite (beyond the reference — it
ships no path operator; see operators/paths.py).

The oracle mirrors the window-function construction exactly: same
(ts, event_id) total order, same NULL-prefix truncation via
CASE-guarded lead/lag, same concat_ws rendering (DuckDB's concat_ws
also skips NULLs), same (n_starts DESC, path ASC) deterministic
top-k cut.
"""

from __future__ import annotations

import datetime as dt

from ..dsl import EventRef, QueryTime
from ..operators.paths import event_paths, path_dropoff
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))


def _seq_cte(steps: int, direction: str, within_s: int | None,
             exclude: tuple[str, ...], time=S.T_FULL) -> str:
    """CTE ``a``: anchor-filterable rows with __step_i columns."""
    fn = "lead" if direction == "forward" else "lag"
    cols = []
    for i in range(1, steps):
        e = f"{fn}(event_type, {i}) OVER w"
        if within_s is not None:
            t = f"{fn}(ts, {i}) OVER w"
            cmp = (f"{t} <= ts + INTERVAL {within_s} SECOND"
                   if direction == "forward"
                   else f"{t} >= ts - INTERVAL {within_s} SECOND")
            e = f"CASE WHEN {cmp} THEN {e} END"
        cols.append(f"{e} AS s{i}")
    excl = "".join(f" AND event_type <> '{x}'" for x in exclude)
    return f"""
    seq AS (
      SELECT user_id, event_type, {", ".join(cols)}
      FROM events
      WHERE {S.ts_between(*time)}{excl}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )"""


def _paths_oracle(anchor: str, steps: int, direction: str,
                  within_s: int | None, top_k: int,
                  exclude: tuple[str, ...] = (), time=S.T_FULL) -> str:
    names = [f"s{i}" for i in range(1, steps)]
    parts = (["event_type"] + names if direction == "forward"
             else list(reversed(names)) + ["event_type"])
    return f"""
    WITH {_seq_cte(steps, direction, within_s, exclude, time)}
    SELECT concat_ws(' -> ', {", ".join(parts)}) AS path,
           COUNT(*) AS n_starts,
           COUNT(DISTINCT user_id) AS n_users
    FROM seq WHERE event_type = '{anchor}'
    GROUP BY 1 ORDER BY n_starts DESC, path ASC LIMIT {top_k}
    """


def _dropoff_oracle(anchor: str, steps: int, direction: str,
                    within_s: int | None,
                    exclude: tuple[str, ...] = (), time=S.T_FULL) -> str:
    per_step = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS step, s{i} AS next_event, user_id "
        f"FROM seq WHERE event_type = '{anchor}' AND s{i} IS NOT NULL"
        for i in range(1, steps)
    )
    return f"""
    WITH {_seq_cte(steps, direction, within_s, exclude, time)},
    x AS ({per_step})
    SELECT step, next_event, COUNT(*) AS n_starts,
           COUNT(DISTINCT user_id) AS n_users
    FROM x GROUP BY 1, 2
    """


@query("path_forward_from_signup",
       oracle=_paths_oracle("signup", 4, "forward", None, 15))
def path_forward_from_signup(spark, sf_dir):
    """Top-15 4-step journeys starting at signup — the "what do new
    users do first" exploration that a fixed funnel can't answer."""
    return event_paths(
        load_table(spark, sf_dir, "events"),
        anchor=EventRef("signup"), time=_FULL,
        steps=4, direction="forward", top_k=15,
    )


@query("path_backward_to_purchase",
       oracle=_paths_oracle("purchase", 3, "backward", 1800, 15))
def path_backward_to_purchase(spark, sf_dir):
    """Top-15 3-step arrival paths into purchase, bounded to the 30
    minutes before the purchase — "how do buyers get here"."""
    return event_paths(
        load_table(spark, sf_dir, "events"),
        anchor=EventRef("purchase"), time=_FULL,
        steps=3, direction="backward",
        within=dt.timedelta(minutes=30), top_k=15,
    )


@query("path_forward_excl_errors",
       oracle=_paths_oracle("view", 3, "forward", 7200, 20,
                            exclude=("error",)))
def path_forward_excl_errors(spark, sf_dir):
    """Forward paths from view with error events excluded from the
    stream entirely (they neither anchor nor occupy a step) and a
    2-hour step budget."""
    return event_paths(
        load_table(spark, sf_dir, "events"),
        anchor=EventRef("view"), time=_FULL,
        steps=3, direction="forward",
        within=dt.timedelta(hours=2), top_k=20,
        exclude_events=("error",),
    )


@query("path_dropoff_after_view",
       oracle=_dropoff_oracle("view", 4, "forward", 3600))
def path_dropoff_after_view(spark, sf_dir):
    """Per-step event distribution for the 3 events after each view
    within an hour — the sankey-diagram feed; per-step totals are
    monotone non-increasing as paths drop off."""
    return path_dropoff(
        load_table(spark, sf_dir, "events"),
        anchor=EventRef("view"), time=_FULL,
        steps=4, within=dt.timedelta(hours=1),
    )
