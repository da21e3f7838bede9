"""Unit tests for the ingest surface: UA parse, geo enrichment,
denormalization, upsert, compaction, CSV source."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from optiprism_spark.ingest import (
    compact_events,
    denormalize_group_attrs,
    geo_range_table,
    geoip_enrich,
    ip_to_int,
    load_csv,
    ua_enrich,
    upsert_profiles,
)

CHROME_WIN = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
)
SAFARI_IPAD = (
    "Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1"
)
EDGE_MAC = (
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91"
)
OPERA_LINUX = (
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0"
)


CRIOS_IPHONE = (
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1"
)
SAMSUNG_ANDROID = (
    "Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 "
    "(KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36"
)
IE11_WIN7 = "Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko"


def test_ua_parse_families_and_priority(spark):
    df = spark.createDataFrame(
        [
            (0, CHROME_WIN), (1, SAFARI_IPAD), (2, EDGE_MAC), (3, OPERA_LINUX),
            (4, CRIOS_IPHONE), (5, SAMSUNG_ANDROID), (6, IE11_WIN7),
        ],
        "id long, user_agent string",
    )
    rows = {r.id: r for r in ua_enrich(df).collect()}
    assert (rows[0].browser, rows[0].os, rows[0].is_mobile) == ("Chrome", "Windows", False)
    # iPad: uap-core's Mobile Safari family, iOS, device iPad
    assert (rows[1].browser, rows[1].browser_version, rows[1].os,
            rows[1].is_mobile, rows[1].device) == (
        "Mobile Safari", "16.6", "iOS", True, "iPad",
    )
    # Edge/Opera ship "Chrome/" in the UA — family priority must win
    assert (rows[2].browser, rows[2].browser_version, rows[2].os) == (
        "Edge", "120.0.2210.91", "macOS",
    )
    assert (rows[3].browser, rows[3].os) == ("Opera", "Linux")
    # iOS Chrome is WebKit + CriOS token, NOT the Chrome family
    assert (rows[4].browser, rows[4].browser_version, rows[4].os, rows[4].device) == (
        "Chrome Mobile iOS", "120.0.6099.119", "iOS", "iPhone",
    )
    # Samsung Internet ships "Chrome/" too; device model extracted
    assert (rows[5].browser, rows[5].browser_version, rows[5].device) == (
        "Samsung Internet", "23.0", "Samsung SM-S918B",
    )
    # IE11 drops the MSIE token; version comes from rv:
    assert (rows[6].browser, rows[6].browser_version, rows[6].os) == (
        "IE", "11.0", "Windows",
    )


def test_geoip_enrich_broadcast_lookup(spark):
    df = spark.createDataFrame(
        [(1, "0.9.9.9"), (2, "1.2.3.4"), (3, "255.0.0.1")], "id long, ip string"
    )
    out = {r.id: r.country for r in geoip_enrich(df).collect()}
    # first octet % 8 cycles the fixed country list in the test ranges
    assert out == {1: "US", 2: "DE", 3: "AU"}  # 255 % 8 == 7 -> AU
    # the range lookup must be a broadcast EQUI-join on the prefix
    # bucket (residual BETWEEN), never a nested-loop range scan
    plan = geoip_enrich(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geoip_range_join_boundaries(spark):
    """Arbitrary (non-prefix-aligned) ranges: boundary IPs land inside,
    adjacent IPs outside (null country) — true range semantics, not a
    first-octet equality in disguise."""
    geo = spark.createDataFrame(
        # 10.0.0.100 .. 10.0.200.0  and a range crossing a /8 edge
        [(167772260, 167823360, "AA"), (4278190080, 4294967295, "ZZ")],
        "start_ip long, end_ip long, country string",
    )
    df = spark.createDataFrame(
        [
            (1, "10.0.0.100"),   # == start of AA
            (2, "10.0.200.0"),   # == end of AA
            (3, "10.0.0.99"),    # one below AA
            (4, "10.0.200.1"),   # one above AA
            (5, "255.255.255.255"),  # == end of ZZ
            (6, "254.255.255.255"),  # below ZZ
        ],
        "id long, ip string",
    )
    out = {r.id: r.country for r in geoip_enrich(df, geo=geo).collect()}
    assert out == {1: "AA", 2: "AA", 3: None, 4: None, 5: "ZZ", 6: None}


def test_ip_to_int_roundtrip(spark):
    df = spark.createDataFrame(
        [("0.0.0.0",), ("1.2.3.4",), ("255.255.255.255",)], "ip string"
    )
    vals = [r[0] for r in df.select(ip_to_int(F.col("ip"))).collect()]
    assert vals == [0, 16909060, 4294967295]


def test_denormalize_group_attrs(spark):
    events = spark.createDataFrame([(1, 10), (2, 10), (3, 20)], "event_id long, user_id long")
    profiles = spark.createDataFrame([(10, "pro"), (20, "free")], "user_id long, plan string")
    out = denormalize_group_attrs(events, profiles, ["plan"])
    assert {(r.event_id, r.plan) for r in out.collect()} == {(1, "pro"), (2, "pro"), (3, "free")}


def test_upsert_profiles_latest_wins(spark):
    schema = "user_id long, ts string, event_id long, plan string"
    cur = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "free"), (2, "2024-01-01 00:00:00", 2, "free")], schema
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    upd = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", 3, "pro"), (3, "2024-01-02 00:00:00", 4, "trial")], schema
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.user_id: r.plan for r in upsert_profiles(cur, upd).collect()}
    assert out == {1: "pro", 2: "free", 3: "trial"}


def test_compact_events_roundtrip_and_layout(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame(
        [
            (i, f"2024-01-0{1 + i % 3} 0{i % 9}:00:00", i % 4, "click")
            for i in range(40)
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # simulate many small appends (the L0 state compaction fixes)
    for chunk in range(4):
        df.filter(F.col("event_id") % 4 == chunk).repartition(4).write.mode(
            "append"
        ).parquet(src)
    compact_events(spark, src, dst)
    out = spark.read.parquet(dst)
    assert out.count() == 40
    assert set(out.select("dt").distinct().toPandas()["dt"].astype(str)) == {
        "2024-01-01", "2024-01-02", "2024-01-03",
    }
    assert (
        out.select(F.sum("event_id")).first()[0]
        == df.select(F.sum("event_id")).first()[0]
    )


def test_load_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,a\n2,b\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    out = load_csv(spark, str(p), schema)
    assert out.schema == schema
    assert {(r.id, r.name) for r in out.collect()} == {(1, "a"), (2, "b")}


def test_geo_range_table_from_csv(spark, tmp_path):
    """Real GeoLite2-Country export format (CIDR blocks + locations)
    loads into the same (start_ip, end_ip, country) shape and drives
    geoip_enrich unchanged — the production data path for the geo
    transformer."""
    from optiprism_spark.ingest import geo_range_table_from_csv, geoip_enrich

    blocks = tmp_path / "GeoLite2-Country-Blocks-IPv4.csv"
    blocks.write_text(
        "network,geoname_id,registered_country_geoname_id,"
        "represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider\n"
        "8.8.8.0/24,6252001,6252001,,0,0\n"
        "1.0.0.0/8,,2077456,,0,0\n"          # geoname null -> registered fallback
        "91.198.174.0/31,2921044,2921044,,0,0\n"
    )
    locs = tmp_path / "GeoLite2-Country-Locations-en.csv"
    locs.write_text(
        "geoname_id,locale_code,continent_code,continent_name,"
        "country_iso_code,country_name,is_in_european_union\n"
        "6252001,en,NA,\"North America\",US,\"United States\",0\n"
        "2077456,en,OC,Oceania,AU,Australia,0\n"
        "2921044,en,EU,Europe,DE,Germany,0\n"
    )
    geo = geo_range_table_from_csv(spark, str(blocks), str(locs))
    rows = {(r.start_ip, r.end_ip): r.country for r in geo.collect()}
    assert rows[(8 * 2**24 + 8 * 2**16 + 8 * 2**8, 8 * 2**24 + 8 * 2**16 + 8 * 2**8 + 255)] == "US"
    assert rows[(1 * 2**24, 2 * 2**24 - 1)] == "AU"  # /8 + registered fallback
    # /31: two addresses
    base31 = 91 * 2**24 + 198 * 2**16 + 174 * 2**8
    assert rows[(base31, base31 + 1)] == "DE"

    df = spark.createDataFrame(
        [("a", "8.8.8.8"), ("b", "1.2.3.4"), ("c", "9.9.9.9")], "id string, ip string"
    )
    out = {r.id: r.country for r in geoip_enrich(df, geo=geo).collect()}
    assert out == {"a": "US", "b": "AU", "c": None}


def test_tracked_to_events_destination(spark, tmp_path):
    """End-to-end ingester pipeline: HTTP facade buffer (WAL-backed) →
    UA/Geo enrichment → tracked_to_events destination mapping →
    date-partitioned append → reload + Session Begin synthesis — the
    reference source → transformers → destination chain."""
    import json as _json

    from optiprism_spark.ingest import tracked_to_events
    from optiprism_spark.server import make_app
    from optiprism_spark.streaming.sessionize import (
        append_events,
        synthesize_session_begin,
    )
    from .test_server import call

    app = make_app(spark, "/root/testdata/sf0.001", wal_dir=str(tmp_path / "wal"))
    for i, (uid, ev) in enumerate([("7", "view"), ("7", "purchase"), ("anon-x", "view")]):
        st, _ = call(app, "POST", "/api/v1/ingest/tok/track", {
            "userId": uid, "event": ev,
            "timestamp": f"2024-03-01T10:0{i}:00Z",
            "properties": {"revenue": 5.0} if ev == "purchase" else {},
            "context": {"ip": "8.8.8.8", "userAgent": "Mozilla/5.0 Chrome/120.0"},
        })
        assert st == 201

    events = tracked_to_events(app.tracked_df(), base_event_id=1000)
    rows = {r.event_id: r for r in events.collect()}
    assert len(rows) == 3 and all(eid >= 1000 for eid in rows)
    by_type = sorted((r.event_type, r.user_id, r.value) for r in rows.values())
    assert ("purchase", 7, 5.0) in by_type
    anon = [r for r in rows.values() if r.event_type == "view" and r.user_id != 7]
    assert anon and anon[0].user_id > 0  # hashed into the id space
    p = _json.loads(next(r for r in rows.values() if r.event_type == "purchase").props)
    assert p["country"] is not None and p["browser"] == "Chrome"
    assert p["revenue"] == "5.0" or p["revenue"] == "5"  # rides along in props

    dst = str(tmp_path / "events")
    append_events(events, dst)
    reread = spark.read.parquet(dst)
    assert reread.count() == 3
    with_sessions = synthesize_session_begin(reread.drop("dt"))
    # one session per user -> +2 Session Begin rows
    assert with_sessions.count() == 5
    app.checkpoint_ingest()


# ------------------------------------------ ingest-time session store

def test_session_store_touch_and_expire():
    """Reference sessions.rs semantics: first activity or a
    gap-exceeding return starts a new session; expire() drops idle
    records (check_for_deletion) so memory tracks ACTIVE users only."""
    from optiprism_spark.sessions import SessionStore

    s = SessionStore(gap_us=1_000_000)  # 1s gap
    assert s.touch(1, "u1", 0)[0] is True        # first ever
    assert s.touch(1, "u1", 500_000)[0] is False  # within gap
    is_new, displaced = s.touch(1, "u1", 1_600_000)
    assert is_new is True                        # gap exceeded (new session)
    assert displaced == (0, 500_000)             # old span handed back
    assert s.touch(1, "u1", 1_900_000)[0] is False
    assert s.touch(1, "u2", 0)[0] is True        # per-user state
    assert s.active_count() == 2
    # expire returns the records (first/last activity) for Session End
    ended = s.expire(now_us=10_000_000)
    assert ended == [(1, "u1", 1_600_000, 1_900_000), (1, "u2", 0, 0)]
    assert s.active_count() == 0
    assert s.touch(1, "u1", 10_100_000)[0] is True  # post-expiry restart


def test_track_injects_session_begin_synchronously(spark, tmp_path):
    """With the opt-in store, a new session's track carries a
    synthesized Session Begin row AHEAD of it in the buffer (the
    reference track destination's synchronous injection) — and crash
    replay reproduces exactly the same rows without double-injection."""
    from optiprism_spark.server import make_app
    from optiprism_spark.streaming.sessionize import EVENT_SESSION_BEGIN

    from .test_server import call

    SF_DIR = "/root/testdata/sf0.001"
    wal_dir = str(tmp_path / "wal")
    app = make_app(spark, SF_DIR, wal_dir=wal_dir, session_store=True)

    def track(ts, uid="u1", ev="view"):
        st, _ = call(app, "POST", "/api/v1/ingest/tok/track",
                     {"userId": uid, "event": ev, "timestamp": ts})
        assert st == 201

    track("2024-03-01T10:00:00Z")
    track("2024-03-01T10:05:00Z")           # same session
    track("2024-03-01T12:00:00Z")           # >30 min gap: new session
    track("2024-03-01T10:00:00Z", uid="u2", ev="signup")

    from optiprism_spark.streaming.sessionize import EVENT_SESSION_END

    seq = [(r["event_type"], r["user_id"]) for r in app.tracked]
    assert seq == [
        (EVENT_SESSION_BEGIN, "u1"), ("view", "u1"),
        ("view", "u1"),
        # the 12:00 track displaced the idle 10:00-10:05 session: its
        # End (with the true span) precedes the new session's Begin
        (EVENT_SESSION_END, "u1"),
        (EVENT_SESSION_BEGIN, "u1"), ("view", "u1"),
        (EVENT_SESSION_BEGIN, "u2"), ("signup", "u2"),
    ]
    # crash + replay: buffer identical, store state rebuilt (a track
    # within u1's live session does NOT re-inject)
    before = list(app.tracked)
    del app
    app2 = make_app(spark, SF_DIR, wal_dir=wal_dir, session_store=True)
    assert app2.tracked == before
    st, _ = call(app2, "POST", "/api/v1/ingest/tok/track",
                 {"userId": "u1", "event": "click",
                  "timestamp": "2024-03-01T12:10:00Z"})
    assert st == 201
    assert [r["event_type"] for r in app2.tracked[len(before):]] == ["click"]
    # without the store, no injection (default unchanged)
    app3 = make_app(spark, SF_DIR)
    st, _ = call(app3, "POST", "/api/v1/ingest/tok/track",
                 {"userId": "u9", "event": "view",
                  "timestamp": "2024-03-01T10:00:00Z"})
    assert [r["event_type"] for r in app3.tracked] == ["view"]


def test_sweep_emits_session_end_rows(spark, tmp_path):
    """The session sweeper emits one Session End row per expired
    session with the session's span as session_length seconds
    (reference init_session_cleaner loop) — WAL'd, so it survives a
    crash, and replay does not feed synthetic rows back into the
    store."""
    import json as _json

    from optiprism_spark.server import make_app
    from optiprism_spark.streaming.sessionize import (
        EVENT_SESSION_BEGIN, EVENT_SESSION_END)

    from .test_server import call

    wal_dir = str(tmp_path / "wal")
    app = make_app(spark, "/root/testdata/sf0.001", wal_dir=wal_dir,
                   session_store=True)
    for ts in ("2024-03-01T10:00:00Z", "2024-03-01T10:10:00Z"):
        st, _ = call(app, "POST", "/api/v1/ingest/tok/track",
                     {"userId": "u1", "event": "view", "timestamp": ts})
        assert st == 201
    # nothing idle yet at 10:20
    t = lambda s: int(__import__("datetime").datetime.fromisoformat(
        s.replace("Z", "+00:00")).timestamp() * 1_000_000)
    assert app.sweep_sessions(now_us=t("2024-03-01T10:20:00Z")) == 0
    # at 11:00 the session (10:00-10:10) is idle past the 30-min gap
    assert app.sweep_sessions(now_us=t("2024-03-01T11:00:00Z")) == 1
    end_rows = [r for r in app.tracked if r["event_type"] == EVENT_SESSION_END]
    assert len(end_rows) == 1
    assert _json.loads(end_rows[0]["props"])["session_length"] == 600
    assert end_rows[0]["user_id"] == "u1"
    # crash + replay: Session End row persists, store is empty of u1
    del app
    app2 = make_app(spark, "/root/testdata/sf0.001", wal_dir=wal_dir,
                    session_store=True)
    assert [r["event_type"] for r in app2.tracked] == [
        EVENT_SESSION_BEGIN, "view", "view", EVENT_SESSION_END]
    assert app2.sessions.active_count() == 0


def test_parse_user_agent_accepts_name_and_bare_ref_only(spark):
    """r17 (r16 advice): the SQL fast path rebuilds expression text
    from the column's printed form, which only round-trips bare
    references — names (str) and F.col("name") work; literals,
    aliases, and dotted names must be rejected loudly instead of
    parsing wrong."""
    import pytest
    from pyspark.sql import functions as F

    from optiprism_spark.ingest import parse_user_agent

    df = spark.createDataFrame(
        [("Mozilla/5.0 (X11; CrOS x86_64) AppleWebKit/537.36 "
          "(KHTML, like Gecko) Chrome/100.0.0.0 Safari/537.36",)],
        "ua string")
    by_name = df.select(parse_user_agent("ua").alias("p")).collect()[0].p
    by_ref = df.select(parse_user_agent(F.col("ua")).alias("p")).collect()[0].p
    assert by_name == by_ref
    assert by_name.browser == "Chrome" and by_name.os == "Chrome OS"

    for bad in (F.lit("Mozilla/5.0"), F.col("ua").alias("x"),
                F.upper(F.col("ua")), F.col("a.b")):
        with pytest.raises(ValueError, match="bare column reference"):
            parse_user_agent(bad)
