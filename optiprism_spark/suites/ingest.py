"""Ingest-surface oracle suite.

The driver testdata carries no user-agent/IP columns, so these queries
synthesize them DETERMINISTICALLY from ``user_id`` (the identical
expression appears in the oracle SQL) and then run the real enrichment
plumbing — the operators under test are the parse/join/upsert shapes,
not the synthesized inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ingest import geo_range_table, geoip_enrich, ua_enrich, upsert_profiles
from ..operators.records import latest_profile
from ..registry import query
from ..schema import load_table

#: eight fixed real-world UA strings, keyed by user_id % 8, with their
#: hand-derived expected parse (the oracle's ground truth). The set
#: deliberately covers the uap-core priority traps: Edge / Opera /
#: Samsung ship "Chrome/", iOS Chrome is "CriOS/" + WebKit, IE11
#: drops the MSIE token, and mobile variants are their own families
#: (Mobile Safari, Chrome Mobile) exactly as in the public uap-core
#: rule set the reference consumes via uaparser
#: (ingester/src/transformers/user_agent/mod.rs:1-191).
_UAS = [
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        ("Chrome", "120.0.0.0", "Windows", False, "Other"),
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1",
        ("Mobile Safari", "17.0", "iOS", True, "iPhone"),
    ),
    (
        "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
        ("Firefox", "121.0", "Linux", False, "Other"),
    ),
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
        ("Edge", "120.0.2210.91", "Windows", False, "Other"),
    ),
    (
        "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36",
        ("Chrome Mobile", "120.0.6099.144", "Android", True, "Pixel 8"),
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
        ("Chrome Mobile iOS", "120.0.6099.119", "iOS", True, "iPhone"),
    ),
    (
        "Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 "
        "(KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
        ("Samsung Internet", "23.0", "Android", True, "Samsung SM-S918B"),
    ),
    (
        "Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko",
        ("IE", "11.0", "Windows", False, "Other"),
    ),
]

_UA_CASE = "CASE CAST(user_id % 8 AS INT) " + " ".join(
    f"WHEN {i} THEN ('{b}', '{v}', '{o}', {str(m).lower()}, '{d}')"
    for i, (_, (b, v, o, m, d)) in enumerate(_UAS)
) + " END"


@query(
    "ingest_ua_browser_counts",
    oracle=f"""
    WITH parsed AS (SELECT {_UA_CASE} AS p FROM events)
    SELECT p[1] AS browser, p[2] AS browser_version, p[3] AS os,
           p[4] AS is_mobile, p[5] AS device, COUNT(*) AS n
    FROM parsed GROUP BY 1, 2, 3, 4, 5
    """,
)
def ingest_ua_browser_counts(spark, sf_dir):
    """UA-parse enrichment (reference ingester user_agent transformer):
    the oracle carries the hand-derived parse of each fixed UA string,
    so this differentially checks the regex chain itself — family
    priority (Edge/Samsung over Chrome, CriOS over Safari), version
    extraction (rv: for IE11), and the device dimension."""
    events = load_table(spark, sf_dir, "events")
    # r16 (optimization round): aggregate FIRST on the narrow int
    # dictionary key, enrich the 8-row aggregate, then re-aggregate
    # by the parsed fields (exact by associativity of count/sum).
    # The old shape stamped a ~150-byte UA string per event row,
    # probed an 8-row broadcast with it, and hash-aggregated on FIVE
    # string keys over every row; now the scan reads only user_id
    # (one long), the per-row aggregate keys on one int, and both the
    # string construction and the regex-chain parse run on 8 rows —
    # guide §2.3 "shuffle keys and metadata instead of payloads" /
    # §2.4 "aggregate before you shuffle". known_uas still skips the
    # distinct-discovery pass, and the same ua_enrich regex chain is
    # what the oracle differentially checks.
    idx = (F.col("user_id") % 8 + 1).cast("int")
    counts = events.select(idx.alias("__ua_idx")).groupBy("__ua_idx").agg(
        F.count(F.lit(1)).alias("__n"))
    ua = F.element_at(
        F.array(*[F.lit(s) for s, _ in _UAS]), F.col("__ua_idx"))
    enriched = ua_enrich(
        counts.withColumn("user_agent", ua), known_uas=[s for s, _ in _UAS]
    )
    return enriched.groupBy(
        "browser", "browser_version", "os", "is_mobile", "device"
    ).agg(F.sum("__n").alias("n"))


@query(
    "ingest_geo_country_counts",
    oracle="""
    SELECT (['US','DE','BR','IN','JP','GB','FR','AU'])[
             CAST(user_id % 256 AS INT) % 8 + 1] AS country,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def ingest_geo_country_counts(spark, sf_dir):
    """GeoIP enrichment via IP-integer RANGE join (reference ingester
    geo transformer / maxminddb lookup): ranges exploded into prefix
    buckets → broadcast equi-join + residual BETWEEN. Test ranges,
    real range-join mechanics — the oracle reproduces the range →
    country mapping arithmetically."""
    events = load_table(spark, sf_dir, "events")
    ip = F.concat_ws(".", (F.col("user_id") % 256).cast("string"), F.lit("17.0.1"))
    enriched = geoip_enrich(events.withColumn("ip", ip), geo=geo_range_table(spark))
    return enriched.groupBy("country").agg(F.count(F.lit(1)).alias("n"))


@query(
    "ingest_profile_upsert",
    oracle="""
    SELECT user_id, ts, event_type FROM (
      SELECT user_id, ts, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def ingest_profile_upsert(spark, sf_dir):
    """Replacing-merge upsert: profiles derived from the first half of
    the stream, upserted with the second half, must equal the
    latest-version-wins read over the whole stream (reference
    OptiDBImpl::replace + replace-dedup compaction)."""
    events = load_table(spark, sf_dir, "events")
    cut = "2024-01-16 00:00:00"
    base = latest_profile(events.filter(F.col("ts") < cut))
    updates = latest_profile(events.filter(F.col("ts") >= cut))
    merged = upsert_profiles(base, updates)
    return merged.select("user_id", "ts", "event_type")


@query(
    "ingest_geo_mmdb_counts",
    oracle="""
    SELECT (['US','DE','BR','IN','JP','GB','FR','AU'])[
             CAST(user_id % 256 AS INT) % 8 + 1] AS country,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def ingest_geo_mmdb_counts(spark, sf_dir):
    """Same enrichment through the BINARY .mmdb path (reference reads
    GeoLite2 via maxminddb, ingester/src/transformers/geo/mod.rs:1-54):
    a spec-conformant fixture database carrying the synthetic /8
    ranges is compiled, parsed back through the MaxMind-DB reader
    (search tree walk → range enumeration), and fed to the SAME
    bucketed broadcast range-join — the oracle is identical to the CSV
    /synthetic path, so a tree/decoder bug breaks the hash."""
    import os
    import tempfile

    from ..mmdb import build_mmdb, geo_range_table_from_mmdb

    countries = ("US", "DE", "BR", "IN", "JP", "GB", "FR", "AU")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "geo.mmdb")
        build_mmdb(path, [
            (i << 24, 8, {"country": {"iso_code": countries[i % 8]}})
            for i in range(256)
        ])
        geo = geo_range_table_from_mmdb(spark, path)
    events = load_table(spark, sf_dir, "events")
    ip = F.concat_ws(".", (F.col("user_id") % 256).cast("string"), F.lit("17.0.1"))
    enriched = geoip_enrich(events.withColumn("ip", ip), geo=geo)
    return enriched.groupBy("country").agg(F.count(F.lit(1)).alias("n"))
