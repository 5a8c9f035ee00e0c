"""Join operators: inner/left/full/semi/anti/broadcast + a multiway star join.

No reference anchor except R7's anti-join formulation (SURVEY.md §2.1,
``/root/reference/dags/etl.py:66-89`` — keyed idempotent load = left-anti
against existing keys); the rest is declared target surface (§2.2).

Scale notes:
  * Dimension sides (region/nation/supplier/part) go through
    ``catalog.dim`` → explicit ``broadcast()`` hint: at 100 TB the fact
    side never shuffles for those joins (BroadcastHashJoin, map-side).
  * Fact-fact joins (orders ⋈ lineitem, customer ⋈ orders) shuffle on
    the join key — at scale both tables should be bucketed on the key
    at write time to make these co-located; with AQE on, skewed keys
    are split automatically (``skewJoin.enabled``).
  * Semi/anti joins are expressed as ``left_semi``/``left_anti`` so
    Catalyst keeps them as half-joins (no row duplication, no
    post-join distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import dim, table
from solarflare_etl_pipeline_spark.functions.numeric import (
    dsum,
    dsum_exact,
    price_dec,
    rate_dec,
    sql_dsum,
    sql_dsum_exact,
    sql_price,
    sql_rate,
)
from solarflare_etl_pipeline_spark.registry import register


@register(
    "join_inner",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="Equi inner join orders⋈customer (shuffle join at scale; AQE may demote to broadcast).",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_left",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               COUNT(o.o_orderkey) AS n_orders,
               CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_spend
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
    """,
    doc="Left outer join preserving customers with zero orders (COUNT ignores the null-extended rows).",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )
    )


@register(
    "join_full",
    oracle="""
        WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
                    FROM customer GROUP BY c_nationkey),
             sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                    FROM supplier GROUP BY s_nationkey)
        SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
               cn.n_customers, sn.n_suppliers
        FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
    doc="Full outer join of two aggregates; null-extended sides on both ends.",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cn.join(sn, "nationkey", "full").select(
        F.coalesce(cn["nationkey"], sn["nationkey"]).alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


@register(
    "join_semi",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
    doc="Existence join (left_semi): customers with at least one large order; no row duplication.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Anti join: customers with no URGENT order — the reference's idempotent-load "
    "primitive (dags/etl.py:74 ON CONFLICT DO NOTHING ≡ insert ∖ existing keys). "
    "The priority filter keeps the result non-empty at every fixture scale.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast",
    oracle=f"""
        SELECT p.p_brand,
               COUNT(*) AS n_items,
               {sql_dsum_exact(f'{sql_price("l.l_extendedprice")} * (1 - {sql_rate("l.l_discount")})', 'revenue')}
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_type = 'PROMO'
        GROUP BY p.p_brand
    """,
    doc="Explicit broadcast hash join lineitem⋈part (dim side hinted; fact side never shuffles for the join).",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = dim(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum_exact(price_dec("l_extendedprice") * (1 - rate_dec("l_discount")), "revenue"),
        )
    )


@register(
    "join_multiway",
    oracle=f"""
        SELECT n.n_name AS nation, r.r_name AS region,
               COUNT(*) AS n_lineitems,
               {sql_dsum_exact(f'{sql_price("l.l_extendedprice")} * (1 - {sql_rate("l.l_discount")})', 'revenue')}
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n.n_name, r.r_name
    """,
    doc="TPC-H Q5-shaped star join: two fact-fact shuffle joins + two broadcast dim joins, "
    "date filter pushed to the orders scan.",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = table(spark, sf_dir, "lineitem")
    n = dim(spark, sf_dir, "nation")
    r = dim(spark, sf_dir, "region")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(n, n.n_nationkey == c.c_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum_exact(price_dec("l_extendedprice") * (1 - rate_dec("l_discount")), "revenue"),
        )
    )


@register(
    "join_sortmerge",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_lines,
               {sql_dsum('l.l_extendedprice', 'total_price')}
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    doc="Fact-fact equi join pinned to SORT-MERGE via the merge hint (plan "
    "asserted in tests/test_plan_audit.py): both sides shuffle on the key and "
    "sort — the strategy of choice when both sides are huge and neither fits "
    "a hash table, and the one that degrades gracefully by spilling sorted "
    "runs. Same logical result as the hash variants; the point is explicit "
    "physical-strategy control.",
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        l.hint("merge")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice", "total_price"))
    )


@register(
    "join_shuffle_hash",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_lines,
               {sql_dsum('l.l_extendedprice', 'total_price')}
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    doc="Same join pinned to SHUFFLED HASH via the shuffle_hash hint (plan "
    "asserted): shuffle both sides, build a hash table on the smaller — beats "
    "sort-merge when one side is much smaller per partition (no sort of the "
    "big side) but cannot spill the build side; at 100 TB pick it when the "
    "per-partition build fits executor memory, else sort-merge.",
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        l.join(o.hint("shuffle_hash"), l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice", "total_price"))
    )


@register(
    "join_spatial_grid",
    oracle="""
        WITH cust AS (
            SELECT c_custkey,
                   CAST(('0x' || SUBSTR(MD5('x:' || CAST(c_custkey AS VARCHAR)), 1, 4))
                        AS INTEGER) % 1000 AS cx,
                   CAST(('0x' || SUBSTR(MD5('y:' || CAST(c_custkey AS VARCHAR)), 1, 4))
                        AS INTEGER) % 1000 AS cy
            FROM customer
        ),
        supp AS (
            SELECT s_suppkey,
                   CAST(('0x' || SUBSTR(MD5('x:' || CAST(-s_suppkey AS VARCHAR)), 1, 4))
                        AS INTEGER) % 1000 AS sx,
                   CAST(('0x' || SUBSTR(MD5('y:' || CAST(-s_suppkey AS VARCHAR)), 1, 4))
                        AS INTEGER) % 1000 AS sy
            FROM supplier
        ),
        cbins AS (
            SELECT c.*, (c.cx // 25) + o.dx AS bx, (c.cy // 25) + o.dy AS by
            FROM cust c,
                 (SELECT UNNEST([-1, 0, 1]) AS dx) o1,
                 (SELECT UNNEST([-1, 0, 1]) AS dy) o2,
                 LATERAL (SELECT o1.dx AS dx, o2.dy AS dy) o
        )
        SELECT cb.c_custkey, s.s_suppkey,
               CAST((cb.cx - s.sx) * (cb.cx - s.sx)
                    + (cb.cy - s.sy) * (cb.cy - s.sy) AS BIGINT) AS d2
        FROM cbins cb
        JOIN supp s ON s.sx // 25 = cb.bx AND s.sy // 25 = cb.by
        WHERE (cb.cx - s.sx) * (cb.cx - s.sx)
              + (cb.cy - s.sy) * (cb.cy - s.sy) <= 625
    """,
    doc="Spatial proximity join via grid binning — the scalable shape of "
    "every radius/nearest-neighbor spatial join: points land in "
    "cell-size-R bins, each probe row expands to its 3x3 neighbor "
    "cells (a fixed 9x explode, NOT a distance cross join), candidates "
    "meet through an ordinary equi-join on the cell key, and the exact "
    "predicate (squared Euclidean <= R^2, pure BIGINT arithmetic — no "
    "trig, so hash-exact) filters the survivors. Coordinates here are "
    "md5-derived grid positions (the fixtures carry no geo columns; "
    "the JOIN MECHANICS are the operator). The same plan serves "
    "geohash/S2/H3 cells with haversine as the exact predicate — "
    "swap the cell function and metric. Scale: cost is "
    "9|probe| + |pairs-in-neighbor-cells|, linear for bounded point "
    "density, vs the |C|x|S| cross join this replaces; the bin join "
    "shuffles on the cell key, and skewed cells (urban hot spots) "
    "fall back to the join_salted treatment on the cell id.",
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    BIN, R2 = 25, 625

    def coord(prefix: str, key):
        h = F.md5(F.concat(F.lit(prefix), key.cast("string")))
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1000

    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        coord("x:", F.col("c_custkey")).alias("cx"),
        coord("y:", F.col("c_custkey")).alias("cy"),
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        coord("x:", -F.col("s_suppkey")).alias("sx"),
        coord("y:", -F.col("s_suppkey")).alias("sy"),
    ).select(
        "*",
        (F.col("sx") / BIN).cast("int").alias("bx"),
        (F.col("sy") / BIN).cast("int").alias("by"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    cb = c.select(
        "*", F.explode(offsets).alias("o")
    ).select(
        "c_custkey",
        "cx",
        "cy",
        ((F.col("cx") / BIN).cast("int") + F.col("o.dx")).alias("bx"),
        ((F.col("cy") / BIN).cast("int") + F.col("o.dy")).alias("by"),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    return (
        cb.join(F.broadcast(s), ["bx", "by"])
        .where(d2 <= R2)
        .select("c_custkey", "s_suppkey", d2.cast("long").alias("d2"))
    )
