"""Per-key whale (skew) guard — the funnel's one-pass cutoff fold
(funnel.py:345-377), factored out for every operator whose plan joins
or windows on a per-user key and therefore inherits the bot-user
blowup: a single user with 10^5 touches and 10^4 conversions inside a
30-day lookback turns attribution's user-key equi-join into 10^9 rows
on ONE task, and the paths window sorts the whale's whole history in
one partition.

Mechanics (identical to the funnel guard, shared reasoning kept in
one place): one pass over a (key, ts, id)-only projection computes
both the per-key total (count over the key partition) and the cap-th
cutoff (ordered row_number) in the SAME key-hash exchange — the two
window specs share partitioning and sort, so Catalyst plans one
shuffle and one sort with two Window nodes on top. Cutoffs join back
(left) and filter the caller's frame, so the wide downstream
join/window sees at most ``cap`` rows per key. The cutoff frame is
NOT force-broadcast: one row per over-cap key is usually tiny, but a
small cap over a large bot population could make it arbitrarily
large — AQE picks broadcast on its own when the side is small.

Visibility: the funnel warns from inside its Pandas kernel via a
Spark accumulator; these callers are pure-JVM (no Python task to
update an accumulator from), so the guard attaches a named
``observe`` instead — ``keys_capped`` / ``max_key_rows`` land in the
query's observed metrics (QueryExecutionListener, Spark UI SQL tab),
which is where a 100 TB deployment's ops plane reads them.

Semantics: capping is LOSSY for over-cap keys by design — the guard
is OFF by default everywhere and documented as an approximation knob,
exactly like funnel_report's ``max_rows_per_user``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cap_rows_per_key"]


def cap_rows_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    ts_col: str,
    id_col: str,
    keep: str = "first",
    observe_as: Optional[str] = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col``, the chronologically
    first (``keep="first"``) or last (``keep="last"``) in the total
    order (ts_col, id_col). Under-cap keys pass through untouched
    (their cutoff row is absent; the left join leaves NULLs and the
    filter keeps everything).

    NULL contract: ``id_col`` must be NON-NULL — it is the row
    identity and the no-cut sentinel (the events schema's event_id
    satisfies this). NULL ``ts_col`` values are handled and rank
    exactly where the window ranks them (asc → nulls first, desc →
    nulls last, tie-broken by id). Rows with a NULL ``key_col`` pass
    through UNCAPPED: the equi-join back is null-unsafe, so they can
    never match a cutoff row — callers keying on a nullable column
    should filter or fill first."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")

    ts, eid = F.col(ts_col), F.col(id_col)
    order = [ts.asc(), eid.asc()] if keep == "first" else [ts.desc(), eid.desc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    wu = Window.partitionBy(key_col)
    cut = (
        df.select(key_col, ts_col, id_col)
        .select(
            key_col,
            ts_col,
            id_col,
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wu).alias("__wn"),
        )
        .filter((F.col("__wn") > cap) & (F.col("__rn") == cap))
        .select(
            key_col,
            F.col(ts_col).alias("__cut_ts"),
            F.col(id_col).alias("__cut_eid"),
            F.col("__wn"),
        )
    )
    if observe_as is not None:
        cut = cut.observe(
            observe_as,
            F.count(F.lit(1)).alias("keys_capped"),
            F.max("__wn").alias("max_key_rows"),
        )
    cut = cut.drop("__wn")
    # sentinel on the id, not the ts: id_col is non-null by contract,
    # so __cut_eid IS NULL can only mean "no cutoff row joined" — a
    # legitimately-NULL cutoff ts must not read as "cap disabled"
    cut_ts, cut_eid = F.col("__cut_ts"), F.col("__cut_eid")
    no_cut = cut_eid.isNull()
    if keep == "first":
        # asc ranks NULL ts first: a NULL-ts row precedes every
        # non-NULL cutoff ts; among NULL ts, tie-break by id
        keep_cond = (
            no_cut
            | (ts.isNull() & (cut_ts.isNotNull() | (eid <= cut_eid)))
            | (
                ts.isNotNull() & cut_ts.isNotNull()
                & ((ts < cut_ts) | ((ts == cut_ts) & (eid <= cut_eid)))
            )
        )
    else:
        # desc ranks NULL ts last: a non-NULL-ts row precedes every
        # NULL cutoff ts; among NULL ts, tie-break by id desc
        keep_cond = (
            no_cut
            | (
                ts.isNotNull()
                & (cut_ts.isNull() | (ts > cut_ts)
                   | ((ts == cut_ts) & (eid >= cut_eid)))
            )
            | (ts.isNull() & cut_ts.isNull() & (eid >= cut_eid))
        )
    return (
        df.join(cut, key_col, "left")
        .filter(keep_cond)
        .drop("__cut_ts", "__cut_eid")
    )
