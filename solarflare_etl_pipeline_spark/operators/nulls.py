"""Null-semantics operators: the fixtures ship null-free, so these
queries *inject* NULLs (nullif) and then exercise the ANSI behaviors
that differ most across engines if gotten wrong: null grouping keys,
null join keys, count(col) vs count(*), null-safe equality, coalesce
chains, and null ordering.

Reference anchor: R5 — pervasive silent nullability
(``/root/reference/dags/etl.py:54-61``: ``dict.get`` → None → SQL NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import register_views, table
from solarflare_etl_pipeline_spark.functions.numeric import dsum, sql_dsum
from solarflare_etl_pipeline_spark.registry import register


@register(
    "null_agg_keys",
    oracle=f"""
        SELECT NULLIF(l_returnflag, 'N') AS flag_or_null,
               COUNT(*) AS n_all,
               COUNT(NULLIF(l_tax, 0.0)) AS n_taxed,
               {sql_dsum('l_quantity', 'sum_qty')}
        FROM lineitem
        GROUP BY NULLIF(l_returnflag, 'N')
    """,
    doc="NULL grouping keys group together (ANSI); COUNT(col) skips NULLs while "
    "COUNT(*) doesn't — both asserted through an injected-null column.",
)
def null_agg_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"))
        .agg(
            F.count("*").alias("n_all"),
            F.count(F.nullif(F.col("l_tax"), F.lit(0.0))).alias("n_taxed"),
            dsum("l_quantity", "sum_qty"),
        )
    )


@register(
    "null_join_keys",
    oracle="""
        WITH l AS (SELECT NULLIF(CAST(l_quantity AS INT) % 7, 0) AS bucket, l_orderkey
                   FROM lineitem),
             r AS (SELECT NULLIF(CAST(o_orderkey AS INT) % 7, 0) AS bucket, COUNT(*) AS n_orders
                   FROM orders GROUP BY 1)
        SELECT l.bucket, COUNT(*) AS n_lineitems, MAX(r.n_orders) AS n_orders
        FROM l LEFT JOIN r ON l.bucket = r.bucket
        GROUP BY l.bucket
    """,
    doc="NULL join keys never match (ANSI equi-join) — null-bucket rows survive only "
    "via the LEFT join's null extension.",
)
def null_join_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        F.nullif(F.col("l_quantity").cast("int") % 7, F.lit(0)).alias("bucket"), "l_orderkey"
    )
    r = (
        table(spark, sf_dir, "orders")
        .select(F.nullif(F.col("o_orderkey").cast("int") % 7, F.lit(0)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        l.join(r, l.bucket == r.bucket, "left")
        .groupBy(l.bucket)
        .agg(F.count("*").alias("n_lineitems"), F.max("n_orders").alias("n_orders"))
    )


@register(
    "null_safe_eq",
    oracle="""
        WITH t AS (SELECT event_id, NULLIF(user_id % 5, 0) AS a, NULLIF(event_id % 5, 0) AS b
                   FROM events)
        SELECT COUNT(*) AS n_total,
               COUNT(CASE WHEN a = b THEN 1 END) AS n_eq,
               COUNT(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 END) AS n_nullsafe_eq
        FROM t
    """,
    doc="<=> (null-safe equality) vs = : NULL <=> NULL is true, NULL = NULL is NULL.",
)
def null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = table(spark, sf_dir, "events").select(
        F.nullif(F.col("user_id") % 5, F.lit(0)).alias("a"),
        F.nullif(F.col("event_id") % 5, F.lit(0)).alias("b"),
    )
    return t.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("a") == F.col("b"), 1)).alias("n_eq"),
        F.count(F.when(F.col("a").eqNullSafe(F.col("b")), 1)).alias("n_nullsafe_eq"),
    )


@register(
    "null_order",
    oracle="""
        SELECT event_id, NULLIF(user_id % 3, 0) AS key
        FROM events
        ORDER BY NULLIF(user_id % 3, 0) ASC NULLS LAST, event_id
        LIMIT 50
    """,
    doc="Explicit NULLS LAST ordering (engine defaults differ: Spark sorts NULLS FIRST "
    "ascending, DuckDB NULLS LAST — always spell it out).",
)
def null_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_id", F.nullif(F.col("user_id") % 3, F.lit(0)).alias("key")
    )
    return e.orderBy(F.col("key").asc_nulls_last(), F.col("event_id")).limit(50)


@register(
    "null_coalesce",
    oracle="""
        SELECT event_id,
               COALESCE(NULLIF(json_extract_string(props, '$.k'), '0'),
                        CAST(user_id AS VARCHAR),
                        'unknown') AS resolved,
               CASE WHEN NULLIF(value, 0.0) IS NOT NULL THEN 'present' ELSE 'absent' END AS presence
        FROM events
    """,
    doc="Coalesce chains over injected nulls + presence flagging — the reference's "
    "dict.get fallback semantics (R5) as column expressions.",
)
def null_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(
            F.nullif(F.get_json_object("props", "$.k"), F.lit("0")),
            F.col("user_id").cast("string"),
            F.lit("unknown"),
        ).alias("resolved"),
        F.when(F.nullif(F.col("value"), F.lit(0.0)).isNotNull(), "present")
        .otherwise("absent")
        .alias("presence"),
    )


@register(
    "join_not_in_null",
    oracle="""
        SELECT 'not_in_with_null' AS variant, COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 7) FROM orders)
        UNION ALL
        SELECT 'not_in_null_free' AS variant, COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_custkey IS NOT NULL
                                  AND o_custkey <> 7)
    """,
    doc="The NOT IN null trap, registered as a two-row contrast: with "
    "ONE NULL in the subquery (NULLIF plants it), x NOT IN (S) can "
    "never be TRUE — three-valued logic makes it NULL for every "
    "non-member — so the first variant returns 0 customers; the "
    "null-filtered variant returns the intended never-ordered set "
    "(plus key 7, removed from the list). Both engines must agree on "
    "both counts — the parity IS the point, since this is the single "
    "most common silent-wrong-answer migration bug. Spark plans the "
    "null-aware variant as a BroadcastNestedLoopJoin (NullAwareAnti), "
    "the null-free one as a plain broadcast anti hash join — the "
    "null-free spelling (or NOT EXISTS) is the 100 TB guidance, and "
    "this op is the executable reason why.",
)
def join_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'not_in_with_null' AS variant, COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 7) FROM orders)
        UNION ALL
        SELECT 'not_in_null_free' AS variant, COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_custkey IS NOT NULL
                                  AND o_custkey <> 7)
        """
    )
