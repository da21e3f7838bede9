"""Warehouse join suite — general join strategy over the star schema.

The reference deliberately has NO general join operator (SURVEY §2.3:
attributes are denormalized at ingest). Spark has them natively; these
queries prove the engine drives them with the right physical strategy
at scale: dimension chains broadcast (the fact side never shuffles for
them), pre-aggregation happens below wide joins, and two-fact joins
shuffle on the join key once. Plus the dictionary encode/decode
operators (§2.10) as broadcast-map lookups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dictionary import build_dictionary, dict_decode, dict_encode
from ..registry import query
from ..schema import load_table
from ..warehouse_layout import cobucketed_order_facts, order_facts
from . import _sql as S


@query(
    "wh_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           {S.sum_exact('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def wh_revenue_by_nation(spark, sf_dir):
    """Fact⋈fact⋈dim⋈dim chain: lineitem joins orders on the order
    key, customer/nation broadcast onto the result — revenue per
    customer nation. The fact pair is ROUTED (warehouse_layout.
    order_facts): when the co-bucketed layout exists the join runs
    Exchange-free (plan-asserted in tests/test_plans.py); otherwise
    plain parquet pays the two-table shuffle — the worst sf1 scaler
    two rounds running (7.07× at 10× data, SF1_r10), which is why
    the layout is the default answer, not an opt-in twin."""
    o, l = order_facts(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "wh_revenue_by_nation_bucketed",
    oracle=f"""
    SELECT n.n_name AS nation,
           {S.sum_exact('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def wh_revenue_by_nation_bucketed(spark, sf_dir):
    """The same fact⋈fact⋈dim⋈dim revenue query answered from the
    CO-BUCKETED fact layout (warehouse_layout.cobucketed_order_facts):
    orders and lineitem are both bucketed + sorted on the order key at
    write time, so the big join runs Exchange-free — the layout, not
    the query, pays the partitioning cost (plan-asserted in
    tests/test_plans.py). This is the scale path: at 10× data the
    plain-parquet variant's shuffle was the worst sf1 scaler (4.98×,
    SF1_r09)."""
    o, l = cobucketed_order_facts(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "wh_top_brands_by_region",
    oracle=f"""
    SELECT r.r_name AS region, p.p_brand AS brand,
           {S.sum_exact('l.l_quantity')} AS qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def wh_top_brands_by_region(spark, sf_dir):
    """Pure dimension-chain enrichment: every join side is broadcast —
    the lineitem scan flows through with zero shuffles until the final
    aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("p_brand").alias("brand"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("qty"))
    )


@query(
    "wh_order_priority_pipeline",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    )
    GROUP BY 1
    """,
)
def wh_order_priority_pipeline(spark, sf_dir):
    """Semi-join (EXISTS) shape: orders having a returned line item,
    counted by priority. Fact pair routed through the co-bucketed
    layout when available (see wh_revenue_by_nation)."""
    o, l = order_facts(spark, sf_dir)
    returned = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "wh_order_priority_bucketed",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    )
    GROUP BY 1
    """,
)
def wh_order_priority_bucketed(spark, sf_dir):
    """The EXISTS semi-join over the co-bucketed fact layout: both
    sides carry the order-key partitioning on disk, so the left-semi
    join — a fact⋈fact shuffle on plain parquet — runs Exchange-free
    like wh_revenue_by_nation_bucketed (the returnflag filter still
    pushes into the bucketed lineitem scan)."""
    o, l = cobucketed_order_facts(spark, sf_dir)
    returned = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "sql_api_revenue_by_segment",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT c.c_custkey) AS n_customers
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def sql_api_revenue_by_segment(spark, sf_dir):
    """The SQL API path: tables registered as views, query written as
    ANSI SQL via spark.sql — the same engine surface as the DataFrame
    builders (Catalyst compiles both to one plan space)."""
    from ..schema import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c.c_mktsegment AS segment,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
               COUNT(DISTINCT c.c_custkey) AS n_customers
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """)


@query(
    "dict_roundtrip_event_type",
    oracle="""
    WITH d AS (
      SELECT dense_rank() OVER (ORDER BY event_type) AS key, event_type AS value
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT d.key AS event_type_key, e.event_type, COUNT(*) AS n
    FROM events e JOIN d ON e.event_type = d.value
    GROUP BY 1, 2
    """,
)
def dict_roundtrip_event_type(spark, sf_dir):
    """Dictionary encode → aggregate on the int key → late-materialize
    decode (reference DictionaryDecode, SURVEY §2.10): counts grouped
    by compact key, labels joined back after the aggregate."""
    events = load_table(spark, sf_dir, "events")
    d = build_dictionary(events, "event_type")
    encoded = dict_encode(events, "event_type", d)
    agg = encoded.groupBy("event_type_key").agg(F.count(F.lit(1)).alias("n"))
    return dict_decode(agg, "event_type_key", d, keep_key=True).select(
        "event_type_key", "event_type", "n"
    )


@query(
    "dict_persisted_roundtrip",
    oracle="""
    WITH d AS (
      SELECT dense_rank() OVER (ORDER BY event_type) AS key, event_type AS value
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT d.key AS event_type_key, e.event_type, COUNT(*) AS n
    FROM events e JOIN d ON e.event_type = d.value
    GROUP BY 1, 2
    """,
)
def dict_persisted_roundtrip(spark, sf_dir):
    """Catalog-PERSISTED dictionary roundtrip (reference
    metadata/src/dictionaries.rs:121-145): values register once in the
    metadata store and keep their keys across queries and restarts
    (reopen coverage: tests/test_catalog.py). On an empty store the
    sorted batch registration assigns 1-based keys in value order ≡
    dense_rank() OVER (ORDER BY value), which is what makes this
    DuckDB-reproducible; the second sync below proves key stability."""
    from ..catalog import Catalog
    from ..operators.dictionary import persisted_dictionary

    events = load_table(spark, sf_dir, "events")
    cat = Catalog()
    persisted_dictionary(cat, 1, "events", "event_type", df=events)
    # re-sync: already-registered values keep their keys
    d = persisted_dictionary(cat, 1, "events", "event_type", df=events)
    encoded = dict_encode(events, "event_type", d)
    agg = encoded.groupBy("event_type_key").agg(F.count(F.lit(1)).alias("n"))
    return dict_decode(agg, "event_type_key", d, keep_key=True).select(
        "event_type_key", "event_type", "n"
    )


@query(
    "wh_market_share_by_year",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             sn.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(28,6)) AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      WHERE p.p_type = 'PROMO' AND r.r_name = 'AMERICA'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             AS nation_volume,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM vol GROUP BY 1
    """,
)
def wh_market_share_by_year(spark, sf_dir):
    """TPC-H Q8-shaped market share: NATION_1 suppliers' slice of the
    AMERICA-customer PROMO-part volume per order year. The join graph
    is the suite's widest — two facts plus FIVE dimension hops — and
    the physical plan is the point: the fact pair rides the routed
    co-bucketed layout (Exchange-free when present), every dimension
    is a broadcast hash join with its filter applied BEFORE the
    broadcast (part → PROMO only, customer nations → AMERICA only, so
    the filters prune fact rows at the join instead of after), and
    the share is one conditional decimal aggregate — the fact side
    shuffles exactly once, for the final year-grain groupBy."""
    o, l = order_facts(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA")
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cn = (n.join(F.broadcast(r),
                 n.n_regionkey == r.r_regionkey)
          .select(F.col("n_nationkey").alias("cn_key")))
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              ).cast("decimal(28,6)")
    zero = F.lit(0).cast("decimal(28,6)")
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", volume)
              .otherwise(zero)).cast("double").alias("nation_volume"),
        F.sum(volume).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        "nation_volume",
        "total_volume",
    )
