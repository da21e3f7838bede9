"""Ingest surface — transformers, denormalization, upsert, compaction.

Re-expresses the reference's ingester (SURVEY §2.1) Spark-first:

- ``parse_user_agent``: the uaparser enrichment (reference
  ingester/src/transformers/user_agent/mod.rs:1-191) as pure
  ``regexp_extract`` column expressions — JVM-side, codegen-friendly,
  no Python in the hot path. A curated pattern subset, not a port of
  the uap-core database; swap in a fuller pattern list for coverage.
- ``geoip_enrich``: the GeoIP enrichment (reference
  ingester/src/transformers/geo/mod.rs:1-54) as a broadcast join
  against a prefix→location dimension. The real maxminddb reader is
  not available in this environment, so ``fake_geo_table`` builds a
  deterministic stand-in dimension with the same join shape; swap in
  a real GeoLite2 export (CIDR ranges → a range join) without
  touching callers.
- ``denormalize_group_attrs``: the reference copies group/user
  attributes onto event rows at ingest time (ingester/src/
  destinations/local/track.rs:54-100) so queries never join. Same
  here: broadcast the profile table, stamp its columns onto events.
- ``upsert_profiles``: the replacing-table write (storage/src/
  db.rs:802-864 `replace`) as union + latest-version-wins dedup —
  Spark's idiom for ReplacingMergeTree semantics.
- ``compact_events``: the LSM leveled-merge analogue (storage/src/
  compaction.rs, parquet_merger.rs:403-714): read → repartition by
  date → sort within partitions by (user, ts) → overwrite. Restores
  the physical order the sequence operators (funnel) exploit and
  collapses small files — run it periodically, exactly like the
  reference's background compactor.
- ``load_csv``: explicit-schema CSV source (reference test
  ListingTable source, query/src/lib.rs:701-719).

At 100 TB: every transformer here is either a pure projection (scales
embarrassingly) or a broadcast join (no shuffle of the big side); the
only shuffle is compaction's repartition, which is the point of the
job.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import EVENT_ID_COL, EVENT_TIME_COL, EVENT_USER_COL

# ------------------------------------------------------------------ user agent

#: (family, detection regex, version regex) — first match wins, as in
#: uap-core. Order matters: Edge/OPR ship "Chrome/" in their UA.
_BROWSERS = (
    ("Edge", r"Edg(?:e|A|iOS)?/", r"Edg(?:e|A|iOS)?/(\d+[\.\d]*)"),
    ("Opera", r"OPR/", r"OPR/(\d+[\.\d]*)"),
    ("Chrome", r"Chrome/", r"Chrome/(\d+[\.\d]*)"),
    ("Firefox", r"Firefox/", r"Firefox/(\d+[\.\d]*)"),
    ("Safari", r"Safari/", r"Version/(\d+[\.\d]*)"),
)
_OSES = (
    ("Windows", r"Windows NT"),
    ("Android", r"Android"),  # before Linux: Android UAs carry "Linux"
    ("iOS", r"iPhone|iPad|iPod"),
    ("macOS", r"Mac OS X"),
    ("Linux", r"Linux"),
)


def parse_user_agent(ua: Column) -> Column:
    """struct(browser, browser_version, os, is_mobile) from a raw
    user-agent string — chained `when` over regexes, fully JVM-side."""
    browser = F.lit(None).cast("string")
    version = F.lit(None).cast("string")
    for fam, det, ver in reversed(_BROWSERS):
        hit = ua.rlike(det)
        browser = F.when(hit, F.lit(fam)).otherwise(browser)
        version = F.when(hit, F.regexp_extract(ua, ver, 1)).otherwise(version)
    osname = F.lit(None).cast("string")
    for fam, det in reversed(_OSES):
        osname = F.when(ua.rlike(det), F.lit(fam)).otherwise(osname)
    is_mobile = ua.rlike(r"Mobile|Android|iPhone|iPad")
    return F.struct(
        browser.alias("browser"),
        version.alias("browser_version"),
        osname.alias("os"),
        is_mobile.alias("is_mobile"),
    )


def ua_enrich(df: DataFrame, ua_col: str = "user_agent", via_distinct: bool = True) -> DataFrame:
    """Stamp parsed UA fields onto rows.

    ``via_distinct`` (default) runs the regex chain over DISTINCT UA
    strings and broadcast-joins the result back — UA cardinality is
    orders of magnitude below row count, so the regex work drops from
    O(rows) to O(distinct UAs). Set False to evaluate inline (cheaper
    when UAs are near-unique)."""
    parsed = parse_user_agent(F.col(ua_col))
    fields = {
        "browser": parsed["browser"],
        "browser_version": parsed["browser_version"],
        "os": parsed["os"],
        "is_mobile": parsed["is_mobile"],
    }
    if not via_distinct:
        return df.withColumns(fields)
    dim = df.select(ua_col).distinct().withColumns(fields)
    return df.join(F.broadcast(dim), ua_col, "left")


# ------------------------------------------------------------------ geoip

_GEO_COUNTRIES = (
    "US", "DE", "BR", "IN", "JP", "GB", "FR", "AU",
)


def fake_geo_table(spark: SparkSession) -> DataFrame:
    """Deterministic stand-in for the maxminddb city database: one row
    per /8 prefix, country cycling through a fixed list. STUB data,
    real join shape — replace with a GeoLite2 export in production."""
    return spark.range(256).select(
        F.col("id").cast("int").alias("ip_prefix"),
        F.element_at(
            F.array(*[F.lit(c) for c in _GEO_COUNTRIES]),
            (F.col("id") % len(_GEO_COUNTRIES) + 1).cast("int"),
        ).alias("country"),
    )


def geoip_enrich(
    df: DataFrame, ip_col: str = "ip", geo: Optional[DataFrame] = None
) -> DataFrame:
    """Stamp `country` onto rows by first-octet lookup. The dimension
    broadcasts; the event side never shuffles."""
    geo = geo if geo is not None else fake_geo_table(df.sparkSession)
    prefix = F.split(F.col(ip_col), r"\.").getItem(0).cast("int")
    return (
        df.withColumn("ip_prefix", prefix)
        .join(F.broadcast(geo), "ip_prefix", "left")
        .drop("ip_prefix")
    )


# ------------------------------------------------------- denormalize profiles

def denormalize_group_attrs(
    events: DataFrame,
    profiles: DataFrame,
    attrs: Sequence[str],
    on: str = EVENT_USER_COL,
) -> DataFrame:
    """Copy profile attributes onto event rows (the reference's
    ingest-time denormalization) — broadcast left join, so analytics
    queries stay join-free."""
    dim = profiles.select(on, *attrs)
    return events.join(F.broadcast(dim), on, "left")


# ------------------------------------------------------------------ upsert

def upsert_profiles(
    current: DataFrame,
    updates: DataFrame,
    key_col: str = EVENT_USER_COL,
    version_cols: Sequence[str] = (EVENT_TIME_COL, EVENT_ID_COL),
) -> DataFrame:
    """Replacing-merge upsert: union then keep the max-version row per
    key (reference OptiDBImpl::replace + replace-dedup compaction).
    With Delta/Iceberg this becomes MERGE INTO; plain-parquet Spark
    expresses it as a read-side window dedup."""
    merged = current.unionByName(updates, allowMissingColumns=True)
    w = Window.partitionBy(key_col).orderBy(*[F.desc(c) for c in version_cols])
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ------------------------------------------------------------------ compaction

def compact_events(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    date_col: str = "dt",
    sort_cols: Sequence[str] = (EVENT_USER_COL, EVENT_TIME_COL, EVENT_ID_COL),
) -> None:
    """Periodic rewrite job: re-cluster the append-heavy events table
    into one date-partitioned, (user, ts)-sorted layout. This is the
    reference's LSM compaction re-expressed as `read → repartition →
    sortWithinPartitions → overwrite`: small files collapse, and the
    physical order lets sequence operators skip their shuffle when the
    table is also bucketed."""
    df = spark.read.parquet(src_path)
    if date_col not in df.columns:
        df = df.withColumn(date_col, F.to_date(F.col(EVENT_TIME_COL)))
    (
        df.repartition(F.col(date_col))
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy(date_col)
        .parquet(dst_path)
    )


# ------------------------------------------------------------------ sources

def load_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """Explicit-schema CSV source — no inference pass over the data
    (inference is a full extra scan at 100 TB)."""
    return spark.read.csv(path, schema=schema, header=header)
