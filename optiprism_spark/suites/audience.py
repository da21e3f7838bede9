"""Audience set-algebra oracle suite (operators/audience.py — beyond
the reference: its segments answer one cohort at a time and its HLL
distinct counts cannot intersect).

The KMV query is exact-regime-oracled: below K distinct users the
sketch holds every hash, theta is 1.0, and the estimates ARE the
exact counts the SQL computes — the same sparse-regime contract the
rollup's HLL column and the qsketch percentiles use. At 100 TB the
same query returns ±1/sqrt(K) estimates from day-grain stored
sketches instead of a raw scan.
"""

from __future__ import annotations

import datetime as dt

from ..dsl import EventRef, QueryTime
from ..operators.audience import (
    audience_set_count,
    audience_set_count_from_day_sketches,
    audience_venn,
    audience_venn_from_day_sketches,
    kmv_day_sketches,
    overlap_matrix,
    overlap_matrix_from_day_sketches,
)
from ..registry import query
from ..schema import load_table
from . import _sql as S

_FULL = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59))

#: distinct (user, event_type) pairs in the window — every audience
#: question below derives from this one reduction
_D = f"""
    d AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE {S.ts_between(*S.T_FULL)}
    )
"""

#: per-user boolean flags for the three named audiences (the SQL
#: mirror of operators/audience.audience_flags)
_FLAGS = f"""
    flags AS (
      SELECT user_id,
             MAX(event_type = 'signup')   AS a,
             MAX(event_type = 'purchase') AS b,
             MAX(event_type = 'error')    AS c
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1
    )
"""


@query(
    "aud_overlap_matrix",
    oracle=f"""
    WITH {_D},
    s AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
    p AS (
      SELECT a.event_type AS dim_a, b.event_type AS dim_b,
             COUNT(*) AS overlap
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.dim_a, p.dim_b, sa.n AS users_a, sb.n AS users_b,
           p.overlap,
           CAST(p.overlap AS DOUBLE) / (sa.n + sb.n - p.overlap) AS jaccard
    FROM p JOIN s sa ON sa.event_type = p.dim_a
           JOIN s sb ON sb.event_type = p.dim_b
    """,
)
def aud_overlap_matrix(spark, sf_dir):
    """Pairwise distinct-user overlap + Jaccard between every pair of
    event-type audiences — the "which behaviors co-occur" matrix."""
    return overlap_matrix(load_table(spark, sf_dir, "events"), _FULL)


@query(
    "aud_venn_signup_purchase",
    oracle=f"""
    WITH {_FLAGS}
    SELECT CAST(COALESCE(SUM(CASE WHEN a THEN 1 ELSE 0 END), 0) AS BIGINT) AS users_a,
           CAST(COALESCE(SUM(CASE WHEN b THEN 1 ELSE 0 END), 0) AS BIGINT) AS users_b,
           CAST(COALESCE(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END), 0) AS BIGINT) AS both,
           CAST(COALESCE(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS a_only,
           CAST(COALESCE(SUM(CASE WHEN b AND NOT a THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS b_only,
           CAST(COALESCE(SUM(CASE WHEN a OR b THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS union_users,
           CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN a OR b THEN 1 ELSE 0 END) AS jaccard
    FROM flags
    """,
)
def aud_venn_signup_purchase(spark, sf_dir):
    """Two-audience Venn decomposition in one aggregate row — no
    joins, one groupBy(user) pass (audience_flags) then conditional
    sums."""
    return audience_venn(
        load_table(spark, sf_dir, "events"),
        EventRef("signup"), EventRef("purchase"), _FULL)


@query(
    "aud_set_and_not",
    oracle=f"""
    WITH {_FLAGS}
    SELECT COUNT(*) AS n_users FROM flags WHERE a AND b AND NOT c
    """,
)
def aud_set_and_not(spark, sf_dir):
    """Boolean set expression over three audiences — "signed up AND
    purchased AND never errored" — via the JSON-serializable
    set-expression AST (the HTTP surface carries the same shape)."""
    return audience_set_count(
        load_table(spark, sf_dir, "events"),
        {"a": EventRef("signup"), "b": EventRef("purchase"),
         "c": EventRef("error")},
        {"op": "and", "args": [
            {"ref": "a"}, {"ref": "b"},
            {"op": "not", "args": [{"ref": "c"}]}]},
        _FULL)


#: exact through sf0.1 (max 1,500 distinct users per event-type) and
#: ~10x beyond; production uses K ~ 4k and takes ±1.6% from the same
#: code path
_KMV_K = 8192


@query(
    "aud_venn_kmv_sketched",
    oracle=f"""
    WITH {_D},
    m AS (
      SELECT
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'signup'
                                 THEN user_id END) AS DOUBLE) AS users_a,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                 THEN user_id END) AS DOUBLE) AS users_b,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'signup'
                                 THEN user_id END)
           + COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                 THEN user_id END)
           - COUNT(DISTINCT user_id)
             FILTER (event_type IN ('signup', 'purchase')) AS DOUBLE)
          AS "both",
        CAST(COUNT(DISTINCT user_id)
             FILTER (event_type IN ('signup', 'purchase')) AS DOUBLE)
          AS union_users
      FROM d
    )
    SELECT users_a, users_b, "both", union_users,
           "both" / union_users AS jaccard
    FROM m
    """,
)
def aud_venn_kmv_sketched(spark, sf_dir):
    """The same signup×purchase Venn answered from DAY-GRAIN KMV
    sketches (built here; maintained incrementally in production like
    the rollup's HLL column): merge day sketches per audience, then
    pure array expressions — the no-raw-scan serving path, exact in
    the sparse regime (theta = 1.0)."""
    days = kmv_day_sketches(
        load_table(spark, sf_dir, "events"), _FULL, k=_KMV_K)
    return audience_venn_from_day_sketches(
        days, "signup", "purchase", k=_KMV_K)


@query(
    "aud_set_kmv_sketched",
    oracle=f"""
    WITH {_FLAGS}
    SELECT CAST(COUNT(*) FILTER (a AND b AND NOT c) AS DOUBLE) AS n_users
    FROM flags
    """,
)
def aud_set_kmv_sketched(spark, sf_dir):
    """The same "signed up AND purchased AND never errored" count
    answered from DAY-GRAIN KMV sketches (r13: arbitrary boolean set
    expressions — including NOT — now serve from the store): restrict
    every referenced sketch to the common theta, evaluate the
    expression per surviving hash, scale by 1/theta. Exact-regime
    oracled; ±1/sqrt(K) from stored sketches at 100 TB."""
    days = kmv_day_sketches(
        load_table(spark, sf_dir, "events"), _FULL, k=_KMV_K)
    return audience_set_count_from_day_sketches(
        days,
        {"op": "and", "args": [
            {"ref": "signup"}, {"ref": "purchase"},
            {"op": "not", "args": [{"ref": "error"}]}]},
        k=_KMV_K)


@query(
    "aud_overlap_matrix_kmv_sketched",
    oracle=f"""
    WITH {_D},
    s AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
    p AS (
      SELECT a.event_type AS dim_a, b.event_type AS dim_b,
             COUNT(*) AS overlap
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.dim_a, p.dim_b,
           CAST(sa.n AS DOUBLE) AS users_a,
           CAST(sb.n AS DOUBLE) AS users_b,
           CAST(p.overlap AS DOUBLE) AS overlap,
           CAST(p.overlap AS DOUBLE) / (sa.n + sb.n - p.overlap) AS jaccard
    FROM p JOIN s sa ON sa.event_type = p.dim_a
           JOIN s sb ON sb.event_type = p.dim_b
    """,
)
def aud_overlap_matrix_kmv_sketched(spark, sf_dir):
    """The K×K overlap matrix answered from DAY-GRAIN KMV sketches
    (r13: the family's most expensive surface no longer forces a raw
    scan): merge stored day sketches per dim, then a dims²-row
    broadcast self-join of pure array expressions. Exact-regime
    oracled — below K distinct users per dim the estimates ARE the
    exact counts (doubles); at 100 TB the same code path serves
    ±1/sqrt(K) estimates from the store."""
    days = kmv_day_sketches(
        load_table(spark, sf_dir, "events"), _FULL, k=_KMV_K)
    return overlap_matrix_from_day_sketches(days, k=_KMV_K)


@query(
    "aud_overlap_matrix_topk",
    oracle=f"""
    WITH {_D},
    top AS (
      SELECT event_type FROM (
        SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1
        ORDER BY n DESC, event_type ASC LIMIT 3)
    ),
    dg AS (SELECT d.* FROM d JOIN top USING (event_type)),
    s AS (SELECT event_type, COUNT(*) AS n FROM dg GROUP BY 1),
    p AS (
      SELECT a.event_type AS dim_a, b.event_type AS dim_b,
             COUNT(*) AS overlap
      FROM dg a JOIN dg b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.dim_a, p.dim_b, sa.n AS users_a, sb.n AS users_b,
           p.overlap,
           CAST(p.overlap AS DOUBLE) / (sa.n + sb.n - p.overlap) AS jaccard
    FROM p JOIN s sa ON sa.event_type = p.dim_a
           JOIN s sb ON sb.event_type = p.dim_b
    """,
)
def aud_overlap_matrix_topk(spark, sf_dir):
    """The overlap matrix with its cardinality guard EXERCISED (top-3
    dims by distinct-user count, ties by dim): the shape that makes
    the operator safe on URL/user-agent-grade columns — output bounded
    to K²/2 pairs, per-user join fan-out bounded by K, and the guard's
    semi-join preserves the user partitioning so the pair join stays
    Exchange-free."""
    return overlap_matrix(
        load_table(spark, sf_dir, "events"), _FULL, max_dims=3)


#: value-filtered audiences (plain event names are degenerate on the
#: synthetic data — every user does every event type): "made a big
#: purchase" / "hit a big error", as custom events with member filters
def _big(event: str, gt: float) -> EventRef:
    from ..dsl import EventFilterSpec, PropFilter, PropOp, PropertyRef

    return EventRef(custom=[EventFilterSpec(
        EventRef(event),
        [PropFilter(PropertyRef.column("value"), PropOp.GT, [gt])])])


@query(
    "aud_scoped_count_daily",
    oracle=f"""
    WITH flags AS (
      SELECT user_id,
             MAX(event_type = 'purchase' AND value > 200.0) AS a,
             MAX(event_type = 'error' AND value > 250.0) AS c
      FROM events WHERE {S.ts_between(*S.T_FULL)}
      GROUP BY 1
    ),
    aud AS (SELECT user_id FROM flags WHERE a AND NOT c)
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS count
    FROM events
    WHERE {S.ts_between(*S.T_FULL)}
      AND user_id IN (SELECT user_id FROM aud)
    GROUP BY 1
    """,
)
def aud_scoped_count_daily(spark, sf_dir):
    """Composition seam exercised: daily event counts SCOPED to the
    audience "made a >200 purchase AND never hit a >250 error"
    (value-filtered custom-event audiences) — the audience user set
    (one groupBy(user) pass, user-scale) broadcast into a left-semi
    join against the same stream, then the ordinary daily count. Any
    query family scopes the same way."""
    from pyspark.sql import functions as F

    from ..operators.aggregates import bucket_col
    from ..dsl import TimeIntervalUnit
    from ..exprs import full_filter
    from ..operators.audience import audience_users

    events = load_table(spark, sf_dir, "events")
    users = audience_users(
        events,
        {"a": _big("purchase", 200.0), "c": _big("error", 250.0)},
        {"op": "and", "args": [
            {"ref": "a"}, {"op": "not", "args": [{"ref": "c"}]}]},
        _FULL)
    return (
        events.filter(full_filter(_FULL))
        .join(F.broadcast(users), "user_id", "left_semi")
        .groupBy(bucket_col(TimeIntervalUnit.DAY).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


#: day-aligned bounds the user-day store requires (whole days; the
#: raw-window T_FULL above ends at :59 seconds which the store's
#: _day_aligned guard rejects)
_FULL_DAYS = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31, 23, 59, 59, 999999))
_T_DAYS = ("2024-01-01 00:00:00", "2024-01-31 23:59:59.999999")
_WEEK1 = QueryTime.between(
    dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 7, 23, 59, 59, 999999))
_T_WEEK1 = ("2024-01-01 00:00:00", "2024-01-07 23:59:59.999999")


@query(
    "aud_set_count_routed",
    oracle=f"""
    WITH flags AS (
      SELECT user_id,
             MAX(event_type = 'signup')   AS a,
             MAX(event_type = 'purchase') AS b,
             MAX(event_type = 'error')    AS c
      FROM events WHERE {S.ts_between(*_T_WEEK1)}
      GROUP BY 1
    )
    SELECT COUNT(*) AS n_users FROM flags WHERE (a OR b) AND NOT c
    """,
)
def aud_set_count_routed(spark, sf_dir):
    """audience_set_count served FROM the user-day store
    (userday.set_count_from_user_day): EXACT boolean set-expression
    counts with no raw-event scan — membership flags fold from (dt,
    user, event_type) partials (a partial exists iff ≥1 raw event
    did), so routed ≡ raw by construction. The week-1 window keeps
    the NOT clause non-degenerate on the synthetic corpus (over a
    full month every user hits every event type)."""
    from ..suites.engagement import persisted_user_day_store
    from ..userday import set_count_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return set_count_from_user_day(
        st.read(spark),
        {"a": EventRef("signup"), "b": EventRef("purchase"),
         "c": EventRef("error")},
        {"op": "and", "args": [
            {"op": "or", "args": [{"ref": "a"}, {"ref": "b"}]},
            {"op": "not", "args": [{"ref": "c"}]}]},
        _WEEK1)


@query(
    "aud_scoped_count_daily_routed",
    oracle=f"""
    WITH flags AS (
      SELECT user_id,
             MAX(event_type = 'purchase') AS a,
             MAX(event_type = 'error')    AS c
      FROM events WHERE {S.ts_between(*_T_WEEK1)}
      GROUP BY 1
    ),
    aud AS (SELECT user_id FROM flags WHERE a AND NOT c)
    SELECT {S.bucket('day')} AS bucket, COUNT(*) AS count
    FROM events
    WHERE {S.ts_between(*_T_DAYS)}
      AND user_id IN (SELECT user_id FROM aud)
    GROUP BY 1
    """,
)
def aud_scoped_count_daily_routed(spark, sf_dir):
    """The aud_scoped_count_daily shape served FROM the user-day
    store (userday.scoped_count_from_user_day): the week-1 cohort
    ('purchased, never errored in week 1') folds from the flags
    frame, and the month-long daily trend is Σ n_events of the
    scoped users' partials — both sides one pruned store scan, raw
    events untouched. The audience window ≠ counting window is the
    classic cohort-trend composition and exactly what the store's
    dt-pruning is for."""
    from ..dsl import TimeIntervalUnit
    from ..suites.engagement import persisted_user_day_store
    from ..userday import scoped_count_from_user_day

    st = persisted_user_day_store(spark, sf_dir)
    return scoped_count_from_user_day(
        st.read(spark),
        {"a": EventRef("purchase"), "c": EventRef("error")},
        {"op": "and", "args": [
            {"ref": "a"}, {"op": "not", "args": [{"ref": "c"}]}]},
        _FULL_DAYS, TimeIntervalUnit.DAY, audience_time=_WEEK1)
