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
