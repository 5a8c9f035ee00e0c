"""Subquery operators: scalar, correlated-scalar, IN/NOT-IN, lateral-style.

Declared target surface widening (SURVEY.md §2.2's join_semi/anti row
covers EXISTS; these cover the remaining ANSI subquery shapes Catalyst
de-correlates into joins — verify with .explain that no per-row
re-execution survives).

Scale notes: Catalyst rewrites every one of these into a join against
the (aggregated) subquery — uncorrelated scalars become broadcast
literals, correlated ones become an aggregate + equi join.  Nothing
here executes per-row at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import register_views, table
from solarflare_etl_pipeline_spark.registry import register


@register(
    "subq_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
                                      / COUNT(o_totalprice) FROM orders) AS delta_from_mean
        FROM orders
        WHERE o_totalprice > (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
                                     / COUNT(o_totalprice) FROM orders) * 1.5
    """,
    doc="Uncorrelated scalar subquery (global mean) used in both projection and filter — "
    "Catalyst computes it once and broadcasts the literal.",
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                                      / COUNT(o_totalprice) FROM orders) AS delta_from_mean
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
                                     / COUNT(o_totalprice) FROM orders) * 1.5
        """
    )


@register(
    "subq_correlated",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               (SELECT MAX(o.o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
    """,
    doc="Correlated scalar subquery — de-correlated by Catalyst into an aggregate + "
    "left outer join (customers with no orders get NULL).",
)
def subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               (SELECT MAX(o.o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
        """
    )


@register(
    "subq_in",
    oracle="""
        SELECT p_partkey, p_brand, p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
    doc="IN subquery → left semi join under Catalyst.",
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        """
    )


@register(
    "join_cross",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation
        FROM region r CROSS JOIN nation n
        WHERE n.n_regionkey <> r.r_regionkey
    """,
    doc="Deliberate cross join (dim × dim — the only sanctioned cartesian: both sides "
    "are fixed-cardinality broadcast tables).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").select(F.col("r_name").alias("region"), "r_regionkey")
    n = table(spark, sf_dir, "nation").select(F.col("n_name").alias("nation"), "n_regionkey")
    return (
        r.crossJoin(n)
        .where(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("region", "nation")
    )


@register(
    "join_lateral",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.n_orders, o.max_price
        FROM customer c, LATERAL (
            SELECT COUNT(o_orderkey) AS n_orders,
                   MAX(o_totalprice) AS max_price
            FROM orders
            WHERE o_custkey = c.c_custkey
        ) o
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc="LATERAL correlated subquery (aggregate per outer row) — Catalyst "
    "de-correlates it into one hash aggregate over orders plus a left outer "
    "equi join on the correlation key; nothing re-executes per customer row. "
    "Customers with no orders get n_orders=0 / max_price=NULL (COUNT over the "
    "empty group), same as the oracle's lateral semantics.",
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, o.n_orders, o.max_price
        FROM customer c, LATERAL (
            SELECT COUNT(o_orderkey) AS n_orders,
                   MAX(o_totalprice) AS max_price
            FROM orders
            WHERE o_custkey = c.c_custkey
        ) o
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "subq_exists_chain",
    oracle="""
        WITH li AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS AS is_late
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM li l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.is_late
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.is_late)
        GROUP BY s.s_name
    """,
    doc="The TPC-H Q21 pattern (suppliers who kept orders waiting): a "
    "chained correlated EXISTS + NOT EXISTS over the same derived "
    "relation — count, per supplier, late lineitems in multi-supplier "
    "orders where NO other supplier was late ('late' = shipped > 60 "
    "days after the order date; this schema carries no receipt/commit "
    "dates). Spark side expresses the two EXISTS as LEFT SEMI and LEFT "
    "ANTI joins on (orderkey, suppkey-differs) — the de-correlated "
    "form Catalyst would produce, stated explicitly so the plan is "
    "three hash joins on l_orderkey plus the supplier dim join "
    "(broadcast-sized). One derived `li` lineage feeds all three "
    "legs; everything shuffles on l_orderkey once per leg, no "
    "per-row re-execution. BIGINT/VARCHAR output → hash-exact.",
)
def subq_exists_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("is_late"),
        )
    )
    l1 = li.where("is_late").alias("l1")
    other = li.alias("l2")
    has_other = l1.join(
        other,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    ).alias("l1")
    late_other = li.where("is_late").alias("l3")
    lone_late = has_other.join(
        late_other,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lone_late.join(
            F.broadcast(sup), F.col("l1.l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "subq_scalar_threshold_anti",
    oracle="""
        WITH thresh AS (
            SELECT AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS avg_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_nationkey AS nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
                 AS totacctbal_cents
        FROM customer c, thresh
        WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > thresh.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey
    """,
    doc="The TPC-H Q22 pattern (global-customer sales opportunity): "
    "customers with above-average positive balance who have NEVER "
    "ordered, counted per nation — a scalar aggregate subquery used as "
    "a filter threshold PLUS an anti join, the two classic correlation "
    "shapes in one query. Spark side: the threshold is a 1-row "
    "aggregate broadcast onto the scan (N x 1 nested loop, not a data "
    "cross product), the no-orders test is a LEFT ANTI join on "
    "o_custkey — exactly how Catalyst de-correlates the SQL form. "
    "Balance compared and summed in integer cents (AVG of BIGINTs "
    "yields the same exact rational on both engines only when used as "
    "a comparison bound — the emitted columns are pure BIGINT) → "
    "hash-exact.",
)
def subq_scalar_threshold_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    thresh = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("bal_cents").alias("avg_bal"))
    )
    o = table(spark, sf_dir, "orders").select("o_custkey")
    rich = (
        c.join(F.broadcast(thresh))
        .where(F.col("bal_cents") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return rich.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("numcust"),
        F.sum("bal_cents").cast("long").alias("totacctbal_cents"),
    )


@register(
    "subq_quantified_all",
    oracle="""
        WITH eu AS (
            SELECT o_custkey, o_totalprice
            FROM orders
            WHERE o_orderpriority = '1-URGENT'
        )
        SELECT o.o_orderkey, o.o_custkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents
        FROM orders o
        WHERE o.o_totalprice > ALL (
            SELECT eu.o_totalprice FROM eu WHERE eu.o_custkey = o.o_custkey
        )
        AND o.o_orderpriority <> '1-URGENT'
        ORDER BY o.o_orderkey
    """,
    doc="Quantified comparison subquery (> ALL) — 'non-urgent orders "
    "that beat EVERY urgent order of the same customer': the ANSI "
    "quantified-predicate surface (ALL/ANY/SOME) the subquery family "
    "(IN / EXISTS / correlated scalar) did not yet cover, with its "
    "signature trap: > ALL over an EMPTY correlated set is TRUE, so "
    "customers with no urgent orders pass vacuously — the semantics "
    "NOT-EXISTS-with-negated-predicate preserves and a naive "
    "MAX-comparison silently breaks (MAX over empty is NULL and the "
    "comparison drops the row). Spark's DataFrame API has no ALL "
    "operator; the registered plan de-correlates it as the textbook "
    "rewrite: left join to each customer's urgent MAX (one bounded "
    "aggregate), keep rows where the max is NULL (vacuous truth) OR "
    "beaten — an equi broadcast-able join at any scale, no per-row "
    "subquery execution.",
)
def subq_quantified_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    urgent_max = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("uk"))
        .agg(F.max("o_totalprice").alias("umax"))
    )
    return (
        o.where(F.col("o_orderpriority") != "1-URGENT")
        .join(urgent_max, o["o_custkey"] == urgent_max["uk"], "left")
        .where(F.col("umax").isNull() | (F.col("o_totalprice") > F.col("umax")))
        .select(
            "o_orderkey",
            "o_custkey",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                "total_cents"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "subq_quantified_any",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > ANY (
            SELECT 3 * o2.o_totalprice FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
              AND o2.o_orderkey <> o.o_orderkey
        )
        ORDER BY o.o_orderkey
    """,
    doc="Quantified ANY/SOME comparison — the existential dual of "
    "subq_quantified_all: orders worth more than TRIPLE at least one "
    "OTHER order by the same customer (a whale-order screen). "
    "Rewritten for Spark as the aggregate form (x > 3·ANY(S) ⟺ "
    "x > 3·MIN(S) over the non-self sibling set): per customer the "
    "two smallest totalprices broadcast back, each order compared "
    "against the min EXCLUDING itself — the correlated-subquery-to-"
    "aggregate-join rewrite Catalyst cannot yet do for quantified "
    "comparisons with self-exclusion. Money compares stay on raw "
    "doubles (no arithmetic on the compared side; 3·x is exact for "
    "2-decimal magnitudes). Plan at 100 TB: one per-customer "
    "aggregate + one shuffle join on o_custkey — never the naive "
    "per-row re-scan.",
)
def subq_quantified_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rk"),
        F.min("o_totalprice")
        .over(Window.partitionBy("o_custkey"))
        .alias("min_all"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n_sib"),
    )
    second = (
        ranked.where("rk = 2")
        .select(
            F.col("o_custkey").alias("ck2"),
            F.col("o_totalprice").alias("min_second"),
        )
    )
    j = ranked.join(
        F.broadcast(second), ranked["o_custkey"] == second["ck2"], "left"
    )
    # min over siblings EXCLUDING self: the global min unless this row
    # IS the unique min-holder (rk=1), in which case the second-smallest
    return (
        j.where("n_sib >= 2")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.expr(
                "CASE WHEN rk = 1 THEN min_second ELSE min_all END"
            ).alias("min_other"),
        )
        .where(F.col("o_totalprice") > 3 * F.col("min_other"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )
