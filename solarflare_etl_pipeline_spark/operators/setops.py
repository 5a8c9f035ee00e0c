"""Set operators: union / union all / intersect / except (distinct + multiset).

Declared target surface (SURVEY.md §2.2); no reference anchor.

Scale notes: ``unionByName`` is a zero-cost plan concatenation (no
shuffle); the DISTINCT variants add one hash-aggregate shuffle on all
columns.  ``intersect``/``exceptAll`` compile to aggregate + join
under Catalyst — fine at scale because both sides here are already
projected to narrow key columns before the op (project-then-setop, not
setop-then-project).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register


def _cust_nations(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark, sf_dir):
    return table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


@register(
    "set_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION DISTINCT of customer and supplier nation keys.",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir)).distinct()


@register(
    "set_union_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION ALL — pure plan concatenation, no shuffle.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))


@register(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "set_except",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="EXCEPT (distinct semantics): customers that placed orders minus "
    "the BUILDING market segment. Re-predicated in round 12 (VERDICT r11 "
    "task #3): the old customer-nations-minus-supplier-nations form was "
    "structurally empty at every SF (all 25 nations have suppliers), so "
    "the driver's green row certified only the empty set. This form is "
    "non-empty at every fixture SF (116 / 1198 / 12057 rows at sf0.001/"
    "0.01/0.1) because multiple market segments always place orders. "
    "Same Catalyst shape: project-then-EXCEPT compiles to a left-anti "
    "aggregate join on the narrow key column.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(c)


@register(
    "set_except_all",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="EXCEPT ALL (multiset semantics — per-row multiplicity subtraction).",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_returnflag") == "A").select("l_orderkey")
    r = l.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.exceptAll(r)


@register(
    "set_intersect_all",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        INTERSECT ALL
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="INTERSECT ALL (multiset semantics).",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_returnflag") == "A").select("l_orderkey")
    r = l.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.intersectAll(r)


@register(
    "set_union_by_name",
    oracle="""
        SELECT event_id, event_type,
               value, NULL AS user_id
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT event_id, event_type,
               NULL AS value, user_id
        FROM events WHERE event_type = 'signup'
    """,
    doc="Schema-tolerant union (unionByName with allowMissingColumns): "
    "the two sides carry DIFFERENT column subsets — purchases expose "
    "value, signups expose user_id — and the union aligns by NAME, "
    "null-filling the gaps, where positional UNION would silently pair "
    "mismatched columns (the classic schema-drift landmine when two "
    "pipeline epochs disagree; the batch sibling of "
    "scan_schema_evolution's reader-side merge). Narrow concat, no "
    "shuffle at any scale.",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "event_type", "value"
    )
    signups = e.where(F.col("event_type") == "signup").select(
        "event_id", "event_type", "user_id"
    )
    return purchases.unionByName(signups, allowMissingColumns=True).select(
        "event_id", "event_type", "value", "user_id"
    )
