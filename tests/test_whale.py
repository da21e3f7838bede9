"""NULL contract of the generic whale guard (operators/whale.py):
the no-cut sentinel must be the non-null id (a NULL cutoff ts must not
silently disable the cap), NULL-ts rows must rank exactly where the
window ranks them (asc nulls first / desc nulls last), and NULL keys
pass through uncapped as documented."""

from __future__ import annotations

from optiprism_spark.operators.whale import cap_rows_per_key

SCHEMA = "k string, ts long, id long"

#: None-tolerant total order for (k, ts, id) triples
_KEY = lambda t: (t[0] is None, t[0] or "", t[1] is None, t[1] or 0, t[2])  # noqa: E731


def _rows(df):
    return sorted(((r.k, r.ts, r.id) for r in df.collect()), key=_KEY)


def _ref(rows, cap, keep):
    """Python reference: per key, rank by the window's order (asc →
    NULL ts first, desc → NULL ts last, id tie-break) and keep cap."""
    by_key: dict = {}
    for k, ts, i in rows:
        by_key.setdefault(k, []).append((ts, i))
    out = []
    for k, vs in by_key.items():
        if k is None:  # documented: NULL keys bypass the cap
            out += [(k, ts, i) for ts, i in vs]
            continue
        if keep == "first":
            vs = sorted(vs, key=lambda p: (p[0] is not None, p[0] or 0, p[1]))
        else:
            vs = sorted(
                vs, key=lambda p: (p[0] is None, -(p[0] or 0), -p[1]))
        out += [(k, ts, i) for ts, i in vs[:cap]]
    return sorted(out, key=_KEY)


def test_null_ts_at_cutoff_does_not_disable_cap(spark):
    """keep='first', asc nulls first: with cap=2 the cutoff row itself
    has a NULL ts — the old ts-based sentinel read that as 'no cut'
    and let all 4 rows of the whale through."""
    rows = [("u", None, 1), ("u", None, 2), ("u", 10, 3), ("u", 20, 4),
            ("v", 5, 5)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = cap_rows_per_key(df, "k", 2, "ts", "id", keep="first")
    assert _rows(got) == _ref(rows, 2, "first")
    assert _rows(got) == [("u", None, 1), ("u", None, 2), ("v", 5, 5)]


def test_null_ts_rows_kept_when_they_rank_inside_cap(spark):
    """keep='first': a NULL-ts row ranks before every non-NULL ts and
    must be KEPT, not dropped by a null comparison."""
    rows = [("u", None, 9), ("u", 1, 1), ("u", 2, 2), ("u", 3, 3)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = cap_rows_per_key(df, "k", 2, "ts", "id", keep="first")
    assert _rows(got) == _ref(rows, 2, "first")
    assert _rows(got) == [("u", 1, 1), ("u", None, 9)]


def test_keep_last_ranks_null_ts_last(spark):
    """keep='last', desc nulls last: non-NULL ts rows win the cap
    slots; NULL-ts rows only survive if slots remain."""
    rows = [("u", None, 9), ("u", None, 8), ("u", 1, 1), ("u", 2, 2)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = cap_rows_per_key(df, "k", 3, "ts", "id", keep="last")
    assert _rows(got) == _ref(rows, 3, "last")
    assert _rows(got) == [("u", 1, 1), ("u", 2, 2), ("u", None, 9)]


def test_null_keys_bypass_cap(spark):
    rows = [(None, 1, 1), (None, 2, 2), (None, 3, 3), ("u", 1, 4)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = cap_rows_per_key(df, "k", 1, "ts", "id", keep="first")
    assert _rows(got) == _ref(rows, 1, "first")
    assert len(_rows(got)) == 4  # all NULL-key rows pass through


def test_no_null_basic_cap_still_exact(spark):
    rows = [("u", t, t) for t in range(1, 8)] + [("v", 1, 100)]
    df = spark.createDataFrame(rows, SCHEMA)
    first = cap_rows_per_key(df, "k", 3, "ts", "id", keep="first")
    last = cap_rows_per_key(df, "k", 3, "ts", "id", keep="last")
    assert _rows(first) == _ref(rows, 3, "first")
    assert _rows(last) == _ref(rows, 3, "last")
