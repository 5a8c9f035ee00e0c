"""TPC-H-shaped analytics — the classic decision-support query shapes
not otherwise represented in the registry (q7/q8/q17/q18/q21 from
round 7's first pass; q9/q10/q14/q19 from the second), adapted to the
fixture schema (no partsupp table, no commit/receipt dates; money
arithmetic follows the functions/numeric.py exact-decimal discipline
throughout).

Reference anchor: the reference is an ETL DAG, not a query engine, but
its loaded table is consumed by exactly this class of analyst SQL
(SURVEY.md §0); these shapes — deep multi-joins, nested aggregates,
global-threshold HAVING, correlated-average filters, and the Q21
double-correlation — are the canonical benchmark for whether a SQL
surface is complete.

Scale notes per query in the docstrings; the common themes: dimensions
(region/nation/customer/supplier/part) broadcast, fact-fact joins
shuffle once on the join key, correlated subqueries are rewritten as
aggregate-then-join (Catalyst gets a chance to pick broadcast for the
per-group side), and the Q21 exists/not-exists pair collapses into one
per-order aggregate — no correlated re-scan per row at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.functions.numeric import (
    DEC,
    SQL_DEC,
    dsum,
    sql_dec_to_double,
    sql_dsum,
)
from solarflare_etl_pipeline_spark.registry import register

REV = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q7_volume",
    oracle=f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
               COUNT(*) AS n_lineitems,
               {sql_dsum(REV.replace('l_', 'l.l_'), 'revenue')}
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
    """,
    doc="Q7 (volume shipping) shape: cross-border revenue between every "
    "supplier-nation / customer-nation pair per ship year — the "
    "deepest join chain in the benchmark (lineitem⋈orders⋈customer⋈"
    "nation ⋈ supplier⋈nation). Plan: the one fact-fact join "
    "(lineitem⋈orders) shuffles on orderkey; customer/supplier/nation "
    "are dimensions and broadcast, so the nation tagging adds zero "
    "exchanges; the final aggregate is |nations|^2 x |years| bounded. "
    "Domestic flows excluded as in the spec.",
)
def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["ck"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sk"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.count("*").alias("n_lineitems"),
        dsum(F.expr(REV), "revenue"),
    )


Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"


@register(
    "tpch_q8_share",
    oracle=f"""
        WITH flows AS (
            SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
                   sn.n_name AS supp_nation,
                   CAST({REV.replace('l_', 'l.l_')} AS DECIMAL(30,8)) AS rev
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = cn.n_regionkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
            WHERE r.r_name = '{Q8_REGION}'
        )
        SELECT o_year,
               CAST(CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}'
                                  THEN rev ELSE CAST(0 AS DECIMAL(30,8)) END)
                         AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_lineitems
        FROM flows
        GROUP BY o_year
    """,
    doc=f"Q8 (national market share) shape: {Q8_NATION}'s share of "
    f"revenue sold into {Q8_REGION} customers per order year — the "
    f"nested-aggregate ratio (conditional sum / total sum in ONE "
    f"grouped pass, not two scans). Both sums accumulate in exact "
    f"decimal and convert once via the VARCHAR detour (rule 15); the "
    f"share is a single double division of identical operands. Same "
    f"broadcast-dimension economics as Q7.",
)
def tpch_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cn = n.select(
        F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("c_region")
    )
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["ck"])
        .join(
            F.broadcast(r.where(F.col("r_name") == Q8_REGION)),
            F.col("c_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sk"])
    )
    dec = "decimal(30,8)"
    flows = j.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.expr(REV).cast(dec).alias("rev"),
        (F.col("supp_nation") == Q8_NATION).alias("is_target"),
    )
    return flows.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("is_target"), F.col("rev")).otherwise(F.lit(0).cast(dec)))
            .cast("double")
            / F.sum("rev").cast("double")
        ).alias("mkt_share"),
        F.count("*").alias("n_lineitems"),
    )


@register(
    "tpch_q17_small_qty",
    oracle=f"""
        WITH pa AS (
            SELECT l_partkey,
                   0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8)))
                               AS VARCHAR) AS DOUBLE) / COUNT(*)) AS qty_cut
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
               {sql_dsum('l.l_extendedprice', 'total_price')},
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,8)))
                    AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
        WHERE l.l_quantity < pa.qty_cut
    """,
    doc="Q17 (small-quantity-order revenue) shape: revenue locked in "
    "orders below 20% of the part's average quantity — the correlated "
    "AVG subquery rewritten aggregate-then-join (per-part cuts are "
    "|parts| rows, broadcast; the textbook correlated form re-scans "
    "lineitem per row). The cut itself is an exact-decimal ratio "
    "scaled by 0.2 with identical IEEE ops both engines, so the "
    "comparison is deterministic. avg_yearly converts the exact "
    "decimal sum once, then divides by 7.0 in double on both sides "
    "(decimal-division scale rules differ per engine; IEEE doesn't).",
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    pa = l.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(30,8)")).cast("double")
                / F.count("*")
            )
        ).alias("qty_cut")
    )
    j = l.join(F.broadcast(pa), "l_partkey").where(F.col("l_quantity") < F.col("qty_cut"))
    return j.agg(
        F.count("*").cast("long").alias("n_small"),
        dsum("l_extendedprice", "total_price"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
    )


Q18_QTY = 250  # sum-quantity threshold (fixture p99 ≈ 262)


@register(
    "tpch_q18_large_orders",
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(30,8)))
                                    AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(30,8))) > {Q18_QTY}
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    doc=f"Q18 (large-volume orders) shape: orders whose total quantity "
    f"exceeds {Q18_QTY} (the fixture's ~p99), with their customers, "
    f"top-100 by price — the HAVING-on-aggregate + join + sort-limit "
    f"composite. The HAVING prunes to a tiny key set BEFORE the "
    f"orders/customer joins (semi-join economics: at 100 TB the big "
    f"orders list is thousands of keys, so both joins broadcast the "
    f"FILTERED side, never the fact). Sort-limit lowers to "
    f"TakeOrderedAndProject. Threshold comparison runs on the exact "
    f"decimal sum; the emitted sum_qty converts once to double.",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias("qd"))
        .where(F.col("qd") > Q18_QTY)
        .select("l_orderkey", F.col("qd").cast("double").alias("sum_qty"))
    )
    return (
        F.broadcast(big)
        .join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q21_LATE_DAYS = 60  # shipped > 60 days after order date = "late"


@register(
    "tpch_q21_late_supplier",
    oracle=f"""
        WITH lf AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                       AS is_late
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supps,
                   COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END)
                       AS n_late_supps,
                   MAX(CASE WHEN is_late THEN l_suppkey END) AS late_supp
            FROM lf GROUP BY l_orderkey
        )
        SELECT s.s_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_order p
        JOIN supplier s ON s.s_suppkey = p.late_supp
        WHERE p.n_supps > 1 AND p.n_late_supps = 1
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    doc=f"Q21 (suppliers who kept orders waiting) shape, adapted to the "
    f"fixture's dates (late = shipped > {Q21_LATE_DAYS} days after "
    f"order date): the benchmark's hardest correlation — EXISTS "
    f"(another supplier in the order) AND NOT EXISTS (another LATE "
    f"supplier) — rewritten as ONE per-order aggregate: an order "
    f"blames supplier S exactly when it has >1 distinct suppliers and "
    f"exactly 1 distinct late supplier (then MAX over the late set IS "
    f"that supplier). Equivalence is an identity, not an "
    f"approximation: n_late_supps = 1 ⟺ the late supplier exists and "
    f"no OTHER late supplier exists. One lineitem⋈orders shuffle + "
    f"one per-order aggregate replaces two correlated re-scans per "
    f"row — the difference between a plan that runs at 100 TB and one "
    f"that never finishes.",
)
def tpch_q21_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lf = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY")
        ).alias("is_late"),
    )
    # Two stacked PLAIN aggregates instead of two countDistinct()s: a
    # multi-distinct agg compiles to an Expand (x3 of the joined fact —
    # 18M rows here) before the shuffle; deduping to (order, supplier)
    # grain first with late = max(is_late) computes the same distinct
    # counts with map-side partial aggregation and no row expansion.
    per_supp = lf.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"),
        F.sum("late").alias("n_late_supps"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    blamed = per_order.where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    return (
        blamed.join(F.broadcast(s), blamed["late_supp"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q2_min_cost",
    oracle="""
        WITH sp AS (
            SELECT l_partkey, l_suppkey,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8)))
                        AS VARCHAR) AS DOUBLE) / SUM(l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        best AS (
            SELECT l_partkey, l_suppkey, unit_cost,
                   ROW_NUMBER() OVER (PARTITION BY l_partkey
                                      ORDER BY unit_cost, l_suppkey) AS rk
            FROM sp
        )
        SELECT p.p_partkey, p.p_brand, s.s_name, b.unit_cost,
               n.n_name AS supp_nation
        FROM best b
        JOIN part p ON p.p_partkey = b.l_partkey
        JOIN supplier s ON s.s_suppkey = b.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE b.rk = 1
    """,
    doc="Q2 (minimum-cost supplier) shape, adapted (no partsupp: unit "
    "cost = observed revenue/quantity per supplier-part from "
    "lineitem): the correlated 'supplier with MIN cost for this part' "
    "subquery as a rank-1 window per part with a supplier tiebreak — "
    "one shuffle on partkey, WindowGroupLimit keeps one candidate "
    "per part per map partition; dimensions broadcast after. The "
    "unit cost is an exact-decimal sum divided once by the exact "
    "quantity sum (l_quantity is integral in double form — the "
    "division is one IEEE op both engines).",
)
def tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sp = l.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast("double")
            / F.sum("l_quantity")
        ).alias("unit_cost")
    )
    best = sp.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
        ),
    ).where(F.col("rk") == 1)
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), best["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "unit_cost",
            F.col("n_name").alias("supp_nation"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
                   CAST(EXTRACT(QUARTER FROM l_shipdate) AS BIGINT) AS qtr,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(30,8))) AS revenue_dec
            FROM lineitem GROUP BY 1, 2, 3
        ),
        mx AS (
            SELECT yr, qtr, MAX(revenue_dec) AS max_rev
            FROM rev GROUP BY yr, qtr
        )
        SELECT r.yr, r.qtr, s.s_name,
               CAST(CAST(r.revenue_dec AS VARCHAR) AS DOUBLE) AS revenue
        FROM rev r
        JOIN mx ON mx.yr = r.yr AND mx.qtr = r.qtr
                AND r.revenue_dec = mx.max_rev
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
    doc="Q15 (top supplier) shape: per quarter, the supplier(s) whose "
    "revenue EQUALS the quarterly maximum — the create-view + "
    "max-equality join the spec writes (ties all surface, per spec; "
    "a rank window would arbitrarily break them). The equality runs "
    "on the EXACT DECIMAL revenue, never on doubles (float equality "
    "across engines is the classic Q15 trap); conversion to double "
    "happens after the join, once. The max table is |quarters| rows "
    "— broadcast.",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = l.groupBy(
        F.col("l_suppkey"),
        F.year("l_shipdate").cast("long").alias("yr"),
        F.quarter("l_shipdate").cast("long").alias("qtr"),
    ).agg(
        F.sum(F.expr(f"CAST({REV} AS DECIMAL(30,8))")).alias("revenue_dec")
    )
    mx = (
        rev.groupBy("yr", "qtr")
        .agg(F.max("revenue_dec").alias("max_rev"))
        .select(
            F.col("yr").alias("m_yr"),
            F.col("qtr").alias("m_qtr"),
            "max_rev",
        )
    )
    return (
        rev.join(
            F.broadcast(mx),
            (F.col("yr") == F.col("m_yr"))
            & (F.col("qtr") == F.col("m_qtr"))
            & (F.col("revenue_dec") == F.col("max_rev")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "yr", "qtr", "s_name",
            F.col("revenue_dec").cast("double").alias("revenue"),
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
        SELECT p.p_brand, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size IN (5, 10, 15, 20)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_size
    """,
    doc="Q16 (parts/supplier relationship) shape: distinct supplier "
    "count per (brand, size) over selected sizes, EXCLUDING "
    "complaint suppliers (negative balance stands in for the spec's "
    "comment LIKE) — the NOT IN + COUNT(DISTINCT) composite. The "
    "exclusion list is dimension-sized, and s_suppkey is non-null, "
    "so the NOT IN compiles to a safe broadcast anti join (the "
    "join_not_in_null op documents why a NULLABLE column here would "
    "force BroadcastNestedLoopJoin); p_size IN (...) pushes into the "
    "part scan, pruning before the fact join.",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").where(
        F.col("p_size").isin(5, 10, 15, 20)
    ).select("p_partkey", "p_brand", "p_size")
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(bad, l["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


Q20_SHARE_PCT = 30  # suppliers shipping > 30% of a part's total volume


@register(
    "tpch_q20_excess",
    oracle=f"""
        WITH vol AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS DECIMAL(30,8))) AS q
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        tot AS (
            SELECT l_partkey, SUM(q) AS tq FROM vol GROUP BY l_partkey
        ),
        dominant AS (
            SELECT DISTINCT v.l_suppkey
            FROM vol v
            JOIN tot t ON t.l_partkey = v.l_partkey
            JOIN part p ON p.p_partkey = v.l_partkey
            WHERE p.p_size > 25
              AND v.q * 100 > t.tq * {Q20_SHARE_PCT}
        )
        SELECT s.s_name, n.n_name AS supp_nation
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
        ORDER BY s.s_name
    """,
    doc=f"Q20 (potential promotion) shape, adapted: suppliers who ship "
    f"more than {Q20_SHARE_PCT}% of some large part's total volume — "
    f"the nested semi-join chain (suppliers IN (parts filtered IN "
    f"(volume threshold))) the spec builds from partsupp+availqty, "
    f"rebuilt from observed lineitem volumes. The share comparison "
    f"is exact decimal cross-multiplication (q*100 > tq*{Q20_SHARE_PCT} "
    f"— no division); the dominant-supplier set is dimension-sized "
    f"and drives a LEFT SEMI join against supplier. Two volume "
    f"aggregates + semi joins — nothing correlated re-scans.",
)
def tpch_q20_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    p = table(spark, sf_dir, "part").where(F.col("p_size") > 25).select("p_partkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vol = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias("q")
    )
    tot = vol.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    dominant = (
        vol.join(tot, "l_partkey")
        .join(F.broadcast(p), vol["l_partkey"] == p["p_partkey"], "left_semi")
        .where(F.col("q") * 100 > F.col("tq") * Q20_SHARE_PCT)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", F.col("n_name").alias("supp_nation"))
        .orderBy("s_name")
    )


@register(
    "tpch_q9_profit",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               COUNT(*) AS n_lineitems,
               {sql_dsum(
                   "l.l_extendedprice * (1 - l.l_discount)"
                   " - l.l_quantity * (p.p_retailprice * 0.6)",
                   "profit",
               )}
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    doc="Q9 (product-type profit) shape: profit by supplier nation and "
    "order year over parts matching a name pattern. Fixture "
    "adaptation: no partsupp table, so supply cost is the "
    "deterministic p_retailprice * 0.6 — computed as ONE raw double "
    "expression per row (identical tree both engines, NO ROUND: "
    "rounding a 3-decimal product at a .005 boundary is exactly "
    "where HALF_UP-on-shortest-repr and binary-expansion rounding "
    "diverge), then decimal-accumulated via dsum so the aggregate "
    "is order-independent. Plan: part filter is pushed to the "
    "dimension scan and broadcast-joined (pruning lineitem early), "
    "the one fact-fact join shuffles on orderkey, supplier/nation "
    "broadcast, final agg is |nations| x |years| bounded.",
)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(
                F.expr(
                    "l_extendedprice * (1 - l_discount)"
                    " - l_quantity * (p_retailprice * 0.6)"
                ),
                "profit",
            ),
        )
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q10_returned",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
               COUNT(*) AS n_lineitems,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="Q10 (returned-item reporting) shape: top-20 customers by "
    "revenue lost to returns in one quarter, with nation context — "
    "the classic 'who should we call' operational top-k over a "
    "4-table join. The revenue sum is decimal-accumulated then cast "
    "to double; the top-k orders by (revenue DESC, custkey) so ties "
    "resolve identically in both engines (a bare ORDER BY revenue "
    "LIMIT 20 is nondeterministic under equal revenues). Plan: the "
    "returnflag + date filters push into the scans BEFORE the "
    "orderkey shuffle (the quarter filter kills ~95% of orders), "
    "customer/nation broadcast, and the final top-20 is "
    "TakeOrderedAndProject — no global sort materializes.",
)
def tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(
            "c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation")
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.expr(REV), "revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_share",
    oracle=f"""
        WITH m AS (
            SELECT CAST(DATE_TRUNC('month', o.o_orderdate) AS TIMESTAMP)
                     AS order_month,
                   {sql_dsum(
                       "CASE WHEN p.p_type = 'ECONOMY'"
                       " THEN l.l_extendedprice * (1 - l.l_discount)"
                       " ELSE 0 END",
                       "promo_rev",
                   )},
                   {sql_dsum(
                       "l.l_extendedprice * (1 - l.l_discount)", "total_rev"
                   )}
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        )
        SELECT order_month, promo_rev, total_rev,
               ROUND(100 * promo_rev / total_rev, 9) AS promo_share_pct
        FROM m
        ORDER BY order_month
    """,
    doc="Q14 (promotion effect) shape: one conditional aggregate over "
    "the part-typed join per month — the CASE-inside-SUM revenue "
    "share pattern. Fixture adaptation: p_type 'ECONOMY' stands in "
    "for the PROMO% class. Both the conditional and total sums are "
    "decimal-accumulated (order-independent); the share is the ONE "
    "float division, spelled identically both engines, ROUND 9. "
    "Plan: part broadcasts, one orderkey shuffle, month-bounded "
    "output.",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(p), l["l_partkey"] == p["p_partkey"]
    )
    m = j.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    ).agg(
        dsum(
            F.expr(
                "CASE WHEN p_type = 'ECONOMY'"
                " THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
            ),
            "promo_rev",
        ),
        dsum(F.expr(REV), "total_rev"),
    )
    return m.select(
        "order_month",
        "promo_rev",
        "total_rev",
        F.round(100 * F.col("promo_rev") / F.col("total_rev"), 9).alias(
            "promo_share_pct"
        ),
    ).orderBy("order_month")


@register(
    "tpch_q19_disjunct",
    oracle=f"""
        SELECT COUNT(*) AS n_lineitems,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 50
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="Q19 (discounted revenue) shape: the OR-of-conjunctions "
    "predicate spanning BOTH join sides — the canonical test that an "
    "optimizer keeps a disjunction evaluable after the join instead "
    "of falling back to a cartesian (each disjunct constrains part "
    "AND lineitem columns, so neither side can fully pre-filter; "
    "fixture adaptation: p_size/l_quantity bands replace the "
    "container/shipmode columns the fixtures lack). Plan: part "
    "broadcasts, the disjunction evaluates post-join inside "
    "codegen, and Catalyst still derives the implied "
    "brand IN (...) prune for the part side. Single-row exact "
    "decimal-summed output.",
)
def tpch_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(cond).agg(
        F.count("*").alias("n_lineitems"),
        dsum(F.expr(REV), "revenue"),
    )


@register(
    "tpch_q12_shipmode",
    oracle="""
        SELECT l.l_returnflag AS ship_mode,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag IN ('R', 'A')
          AND l.l_shipdate >= o.o_orderdate
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    doc="Q12 (shipping modes and order priority) shape — the last "
    "classic shape absent from both the direct and equivalence lists "
    "(VERDICT r7 missing #3): two-class conditional counts per mode "
    "over the order⋈lineitem join, CASE-summing urgent/high vs other "
    "priorities inside one aggregate pass. Fixture adaptation per "
    "tpch.py's header note (no l_shipmode / commit / receipt dates): "
    "l_returnflag restricted to ('R','A') stands in for the "
    "MAIL/SHIP mode filter, the receipt-year window becomes a "
    "one-year l_shipdate window, and the cross-table lateness "
    "predicate l_commitdate < l_receiptdate becomes l_shipdate >= "
    "o_orderdate — preserving the defining plan property that one "
    "predicate spans BOTH join sides so neither side can fully "
    "pre-filter. Plan: the mode and date filters push to the "
    "lineitem parquet scan (PushedFilters), the one fact-fact join "
    "shuffles on orderkey (AQE may flip to broadcast at small SF), "
    "the cross-side predicate evaluates post-join in codegen, and "
    "the CASE sums are map-side partial aggregates into a "
    "|modes|-bounded result — one shuffle for the join, one bounded "
    "shuffle for the aggregate, at any scale.",
)
def tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


@register(
    "tpch_q3_priority",
    oracle=f"""
        SELECT l.l_orderkey AS o_orderkey,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
               o.o_orderdate AS o_orderdate,
               o.o_orderpriority AS o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY 1, 3, 4
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    doc="Q3 (shipping priority): the last classic top-k shape missing "
    "an explicit key — unshipped revenue per order for one market "
    "segment's customers, orders placed before the cutoff with "
    "lineitems still shipping after it, top 10 by revenue. Plan: "
    "customer is a broadcast dim (segment filter pushed to its "
    "scan), lineitem⋈orders is the one shuffle (both date filters "
    "pushed to the parquet scans), the per-order aggregate reuses "
    "the join's orderkey partitioning, and the top-10 is "
    "TakeOrderedAndProject (per-partition heaps + driver merge of "
    "10-row heads — no global sort). Determinism: orderkey "
    "tie-break; revenue is the exact-decimal sum cast to double on "
    "both engines, so DESC ranks identically.",
)
def tpch_q3_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(dsum(F.expr(REV), "revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY 1
    """,
    doc="Q4 (order priority checking): orders in one quarter having at "
    "least one SLOW lineitem, counted by priority. The fixture has "
    "no commit/receipt dates (the q12/q21 adaptation precedent), so "
    "'late' = a lineitem shipping >60 days after the order date — "
    "the same correlated-EXISTS structure. Plan: the EXISTS becomes "
    "a LEFT SEMI join on orderkey with the ship-lag predicate as a "
    "join-side filter — one shuffle, no per-row re-scan; the quarter "
    "filter is pushed to the orders scan so the semi join's build "
    "side is one quarter of one year; the final aggregate is "
    "5-priority bounded.",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, slow, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


#: Q11 global-threshold fraction, scaled ×1e6 so the HAVING compares
#: exact decimals (part_value * 1e6 > total_value * threshold_ppm).
Q11_THRESHOLD_PPM = 1000  # 0.1% of total supply value


@register(
    "tpch_q11_important_stock",
    oracle=f"""
        WITH v AS (
            SELECT l.l_partkey AS l_partkey,
                   SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS {SQL_DEC})) AS part_value_dec
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name = 'NATION_1'
            GROUP BY 1
        ),
        t AS (SELECT SUM(part_value_dec) AS total_dec FROM v)
        SELECT v.l_partkey,
               {sql_dec_to_double('v.part_value_dec')} AS part_value
        FROM v, t
        WHERE v.part_value_dec * 1000000 > t.total_dec * {Q11_THRESHOLD_PPM}
    """,
    doc="Q11 (important stock): per-part supply value from one "
    "nation's suppliers, keeping parts whose value exceeds a fixed "
    "fraction of the nation's total — the global-scalar-threshold "
    "HAVING shape (the fixture has no partsupp, so supply value is "
    "lineitem revenue through that nation's suppliers — same "
    "structure: fact⋈dim filter, per-key aggregate, scalar total, "
    "threshold filter). Plan: supplier+nation broadcast (nation "
    "filter pushed before the broadcast), one shuffle for the "
    "per-part aggregate, the total re-aggregates the SMALL per-part "
    "table (|parts| rows) and broadcasts back as a 1-row cross join "
    "— the fact table is scanned once. The threshold compares exact "
    "decimals scaled to ppm (no double division), so the cut is "
    "hash-identical cross-engine.",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_1"
    ).select("n_nationkey")
    v = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(REV).cast(DEC)).alias("part_value_dec"))
    )
    t = v.agg(F.sum("part_value_dec").alias("total_dec"))
    return (
        v.join(F.broadcast(t))
        .where(
            F.col("part_value_dec") * 1000000
            > F.col("total_dec") * Q11_THRESHOLD_PPM
        )
        .select(
            "l_partkey", F.col("part_value_dec").cast("double").alias("part_value")
        )
    )


@register(
    "tpch_q5_local_supplier",
    oracle=f"""
        SELECT n.n_name AS nation,
               COUNT(*) AS n_lineitems,
               {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
        ORDER BY revenue DESC, nation
    """,
    doc="Q5 (local supplier volume) shape: revenue per nation where the "
    "ordering customer and the fulfilling supplier sit in the SAME "
    "nation, one region, one year — the classic 'does local sourcing "
    "pay' rollup and the last missing regional-join benchmark shape "
    "(Q1/Q6/Q13 live as agg_hash/agg_filtered/agg_custdist). The "
    "same-nation constraint rides the supplier join (s_nationkey = "
    "c_nationkey), so no post-join filter re-reads the fact. Revenue "
    "is decimal-accumulated then cast to double (numeric.py "
    "discipline). Plan at 100 TB: the year filter pushes into the "
    "orders scan before the orderkey shuffle (kills ~85% of orders), "
    "customer/supplier/nation/region all broadcast (dims), lineitem "
    "shuffles ONCE on l_orderkey; the 5-nation rollup is map-side "
    "combinable. Ref: the reference's loaded table feeds exactly this "
    "analyst SQL class (SURVEY.md §0).",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.expr(REV), "revenue"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@register(
    "tpch_q22_global_sales",
    oracle=f"""
        WITH cs AS (
            SELECT c_custkey, c_acctbal,
                   CAST(c_nationkey % 7 AS BIGINT) AS cntrycode
            FROM customer
            WHERE (c_nationkey % 7) IN (1, 2, 3, 4, 5)
        ),
        pos AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum,
                   COUNT(*) AS pos_cnt
            FROM cs WHERE c_acctbal > 0.0
        )
        SELECT cs.cntrycode,
               COUNT(*) AS numcust,
               {sql_dsum("cs.c_acctbal", "totacctbal")}
        FROM cs, pos
        WHERE CAST(cs.c_acctbal AS DECIMAL(18,2)) * pos.pos_cnt
                  > pos.pos_sum
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = cs.c_custkey)
        GROUP BY 1
        ORDER BY 1
    """,
    doc="Q22 (global sales opportunity) shape: rich customers who have "
    "NEVER ordered, bucketed by country code — the benchmark's "
    "scalar-subquery + NOT EXISTS finale, the last classic shape "
    "missing from the registry. Adapted to the fixture schema (no "
    "c_phone): cntrycode = c_nationkey % 7 restricted to codes 1-5, "
    "mirroring Q22's 7-code IN list. The 'above average positive "
    "balance' threshold is compared EXACTLY — acctbal(DECIMAL 18,2) * "
    "pos_cnt > pos_sum(DECIMAL) — never through a float average "
    "(the agg_cmh_chi/lorenz exact-compare discipline), and the final "
    "balance total is decimal-accumulated (numeric.py). Plan at "
    "100 TB: the positive-balance summary is a SINGLE-ROW broadcast "
    "onto the customer scan (no correlated re-scan), the no-orders "
    "test is one LEFT ANTI shuffle join on o_custkey, and the 5-row "
    "rollup is map-side combinable. Ref: SURVEY.md §0 analyst SQL.",
)
def tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = (
        table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_acctbal",
            F.pmod(F.col("c_nationkey"), F.lit(7))
            .cast("long")
            .alias("cntrycode"),
        )
        .where(F.col("cntrycode").isin(1, 2, 3, 4, 5))
    )
    pos = cs.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("pos_sum"),
        F.count("*").alias("pos_cnt"),
    )
    o = table(spark, sf_dir, "orders").select("o_custkey")
    rich = cs.join(F.broadcast(pos)).where(
        F.col("c_acctbal").cast("decimal(18,2)") * F.col("pos_cnt")
        > F.col("pos_sum")
    )
    never = rich.join(
        o, rich["c_custkey"] == o["o_custkey"], "left_anti"
    )
    return (
        never.groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT COUNT(*) AS n_lineitems,
               {sql_dsum('l_extendedprice * l_discount', 'revenue_delta')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="Q6 (forecasting revenue change): the canonical single-scan "
    "filter-aggregate — what revenue would have been gained had these "
    "discounts not applied (one ship-year, a discount band, a quantity "
    "cap). Completes the classic 22-query coverage (q1 = agg_hash's "
    "pricing summary, q13 = agg_custdist). The whole plan is one "
    "parquet scan with EVERY predicate pushed to the reader "
    "(PushedFilters on l_shipdate/l_discount/l_quantity) and a "
    "two-column ReadSchema, folding map-side into a single partial "
    "aggregate — at 100 TB this is the min-IO plan: no shuffle beyond "
    "the final 1-row merge, scan bytes bounded by the column pruning "
    "and rowgroup min/max pruning on the date band. Money arithmetic "
    "follows the exact-decimal discipline (dsum) so the driver hash "
    "is bit-stable cross-engine.",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta"),
        )
    )
