"""Reshaping + order-sensitive aggregates: unpivot/melt, collect_list/
set, arg-min/max, percent-of-total windows, date formatting, and the
two-phase salted aggregation pattern for skewed keys.

Determinism rules: collected lists are sorted before output
(collection order is partition-dependent); arg-min/max use orderings
made unique by construction (min_by/max_by tie behavior is
engine-defined otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.functions.numeric import dsum, sql_dsum
from solarflare_etl_pipeline_spark.registry import register


@register(
    "fn_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, rate_kind, rate
        FROM (SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem)
        UNPIVOT (rate FOR rate_kind IN (l_discount AS 'discount', l_tax AS 'tax'))
    """,
    doc="Unpivot/melt: wide rate columns → (kind, value) rows (inverse of agg_pivot).",
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_discount", "l_tax"
    )
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_discount", "l_tax"],
        variableColumnName="rate_kind",
        valueColumnName="rate",
    ).withColumn(
        "rate_kind",
        F.when(F.col("rate_kind") == "l_discount", "discount").otherwise("tax"),
    )


@register(
    "agg_collect",
    oracle="""
        SELECT n_regionkey,
               ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), '|') AS nations,
               ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT n_name)), '|')
                   AS distinct_nations
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="collect_list/collect_set with explicit sort — collection order is "
    "partition-dependent, so lists are canonicalized (sorted) before output, "
    "then serialized to a delimited string: the driver's pandas canonicalizer "
    "cannot hash list cells (ORACLE_PARITY.md rule 18), and a "
    "deterministically-ordered join is the scalar form of the same result.",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        F.array_join(F.array_sort(F.collect_set("n_name")), "|").alias(
            "distinct_nations"
        ),
    )


@register(
    "agg_argminmax",
    oracle="""
        SELECT o_orderpriority,
               ARG_MIN(o_orderkey, o_totalprice) AS cheapest_order,
               ARG_MAX(o_orderkey, o_totalprice) AS priciest_order,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="arg-min/max (min_by/max_by): the key of the extremal row per group. "
    "o_totalprice values are unique per group in the fixture (asserted in unit "
    "tests) so tie behavior never fires.",
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "win_share",
    oracle="""
        SELECT c_mktsegment,
               n_customers,
               CAST(n_customers AS DOUBLE)
                   / SUM(n_customers) OVER () AS segment_share
        FROM (SELECT c_mktsegment, COUNT(*) AS n_customers
              FROM customer GROUP BY c_mktsegment)
    """,
    doc="Percent-of-total: unpartitioned window over a pre-aggregated (small) input — "
    "the safe shape; an OVER () on raw rows would serialize the whole table through "
    "one partition.",
)
def win_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    seg = (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )
    return seg.select(
        "c_mktsegment",
        "n_customers",
        (F.col("n_customers").cast("double") / F.sum("n_customers").over(Window.partitionBy()))
        .alias("segment_share"),
    )


@register(
    "fn_date_format",
    oracle="""
        SELECT o_orderkey,
               STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
               STRFTIME(o_orderdate, '%Y/%m') AS year_month,
               CAST(EPOCH(o_orderdate) AS BIGINT) AS unix_ts,
               CAST(TO_TIMESTAMP(CAST(EPOCH(o_orderdate) AS BIGINT)) AS TIMESTAMP) AS from_unix
        FROM orders
    """,
    doc="Timestamp formatting + unix epoch round-trip (date_format patterns on the "
    "Spark side, strftime on the oracle side — same rendered text).",
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.date_format("o_orderdate", "yyyy/MM").alias("year_month"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.to_timestamp(F.from_unixtime(F.unix_timestamp("o_orderdate"))).alias("from_unix"),
    )


@register(
    "join_salted",
    oracle=f"""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               {sql_dsum('o.o_totalprice', 'total_price')}
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    doc="Salted skew join — the hot-key fix for fact⋈dim when one key dominates: "
    "fact side salts its key (stable hash, not rand()); the small side is exploded "
    "×S so every (key, salt) finds its match; result equals the plain join (the "
    "oracle IS the plain form). At 100 TB apply only to diagnosed hot keys, not "
    "the whole table.",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    SALTS = 8
    o = table(spark, sf_dir, "orders").withColumn(
        "__salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(SALTS))
    )
    c = table(spark, sf_dir, "customer").withColumn(
        "__salt", F.explode(F.array(*[F.lit(s).cast("long") for s in range(SALTS)]))
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o["__salt"] == c["__salt"]))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


@register(
    "dedup_keep_last",
    oracle="""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        FROM (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="Keep-LAST keyed dedup (latest state per (user, event_type)) — the CDC/upsert "
    "complement to dedup_key's first-wins (reference R7 keeps first; state stores "
    "keep last).",
)
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "agg_salted",
    oracle=f"""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               {sql_dsum('l_quantity', 'sum_qty')}
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Two-phase salted aggregation — the skewed-key pattern: group by (key, salt) "
    "for the partial (spreads one hot key over S reducers), then re-aggregate by key. "
    "Result is identical to the direct groupBy (the oracle IS the direct form); at "
    "100 TB this is the fix when one key holds half the table. Salt derives from a "
    "stable row attribute, not rand() (determinism + retry-safety).",
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    SALTS = 16
    l = table(spark, sf_dir, "lineitem").withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALTS))
    )
    partial = l.groupBy("l_returnflag", "__salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias("pq"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_rows"),
        F.sum("pq").cast("double").alias("sum_qty"),
    )


@register(
    "join_skew_aqe",
    oracle=f"""
        WITH fact AS (
            SELECT CASE WHEN l_orderkey % 4 <> 0
                        THEN 0 ELSE l_orderkey % 1024 END AS hot_key,
                   l_extendedprice
            FROM lineitem
        ),
        dim AS (
            SELECT UNNEST(RANGE(0, 1024)) AS hot_key
        )
        SELECT CAST(d.hot_key % 16 AS BIGINT) AS bucket,
               COUNT(*) AS n_rows,
               {sql_dsum('f.l_extendedprice', 'sum_price')}
        FROM fact f JOIN dim d ON f.hot_key = d.hot_key
        GROUP BY 1
    """,
    doc="AQE skew join — the runtime complement to join_salted's compile-time "
    "salting: the fact side's join key is DELIBERATELY skewed (~75% of lineitem "
    "rows collapse onto hot_key 0) and the join is pinned to sort-merge (MERGE "
    "hint — at 100 TB the right side is a fact-sized table no broadcast can "
    "absorb). With spark.sql.adaptive.skewJoin.enabled (set at session "
    "construction, session.py) AQE measures the shuffled partition sizes at "
    "runtime and SPLITS the oversized hot_key-0 partition across many tasks, "
    "replicating the matching right rows — no code change, no salt column, no "
    "prior knowledge of which key is hot. Locally the fixture is below the "
    "256 MB skew threshold, so tests/test_plan_audit.py proves the mechanism "
    "on a threshold-lowered spark.newSession() and asserts 'skew=true' in the "
    "final adaptive plan. The oracle is the plain join — AQE must not change "
    "the answer.",
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(0).cast("long"))
        .otherwise(F.col("l_orderkey") % 1024)
        .alias("hot_key"),
        "l_extendedprice",
    )
    dim = spark.range(0, 1024).select(F.col("id").alias("hot_key"))
    joined = fact.join(dim.hint("merge"), "hot_key")
    return joined.groupBy((F.col("hot_key") % 16).alias("bucket")).agg(
        F.count("*").alias("n_rows"),
        dsum("l_extendedprice", "sum_price"),
    )


@register(
    "join_runtime_bloom",
    oracle=f"""
        SELECT p.p_brand,
               COUNT(*) AS n_rows,
               {sql_dsum('l.l_extendedprice', 'sum_price')}
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size < 5
        GROUP BY p.p_brand
    """,
    doc="Runtime bloom-filter semi-join reduction — the third runtime-filtering "
    "pattern next to join_dpp (partition pruning) and join_skew_aqe (skew "
    "split): a selective predicate on the build side (p_size < 5 keeps ~11% "
    "of part) makes Catalyst inject a bloom-filter aggregate over the "
    "surviving join keys and push might_contain(l_partkey) INTO the probe "
    "side's scan, discarding ~89% of lineitem before the join shuffle. At "
    "100 TB this is what turns a full-fact shuffle into a filtered one when "
    "the dim predicate is selective but the key is not a partition column "
    "(where DPP can't help). Fixture scans sit below the 10 GB "
    "application-side threshold, so tests/test_plan_audit.py proves the "
    "injection on a threshold-lowered newSession; the semantics are the "
    "plain join (the oracle IS the plain form) with or without the filter.",
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = table(spark, sf_dir, "part").where(F.col("p_size") < 5).select("p_partkey", "p_brand")
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_rows"), dsum("l_extendedprice", "sum_price"))
    )


@register(
    "reshape_transpose",
    # The oracle pins the canonical five-type enum as the transposed
    # column set (the parity fixtures always contain all five); every
    # cell is an exact BIGINT.
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_milli,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type
        )
        SELECT 'n' AS key,
               MAX(CASE WHEN event_type = 'click' THEN n END) AS click,
               MAX(CASE WHEN event_type = 'error' THEN n END) AS error,
               MAX(CASE WHEN event_type = 'purchase' THEN n END) AS purchase,
               MAX(CASE WHEN event_type = 'signup' THEN n END) AS signup,
               MAX(CASE WHEN event_type = 'view' THEN n END) AS view
        FROM m
        UNION ALL
        SELECT 'n_users',
               MAX(CASE WHEN event_type = 'click' THEN n_users END),
               MAX(CASE WHEN event_type = 'error' THEN n_users END),
               MAX(CASE WHEN event_type = 'purchase' THEN n_users END),
               MAX(CASE WHEN event_type = 'signup' THEN n_users END),
               MAX(CASE WHEN event_type = 'view' THEN n_users END)
        FROM m
        UNION ALL
        SELECT 'sum_milli',
               MAX(CASE WHEN event_type = 'click' THEN sum_milli END),
               MAX(CASE WHEN event_type = 'error' THEN sum_milli END),
               MAX(CASE WHEN event_type = 'purchase' THEN sum_milli END),
               MAX(CASE WHEN event_type = 'signup' THEN sum_milli END),
               MAX(CASE WHEN event_type = 'view' THEN sum_milli END)
        FROM m
        ORDER BY key
    """,
    doc="DataFrame.transpose() certification (new first-class API in "
    "Spark 4.0, SPARK-47; the metrics-wide-to-metrics-long flip "
    "every ops dashboard does): a bounded per-event-type metric "
    "summary (count / exact milli sum / distinct users) transposed "
    "so METRICS become rows and the event-type enum becomes "
    "columns — the engine derives the column set from the index "
    "column's values, the oracle spells the equivalent manual "
    "conditional-aggregate pivot over the canonical enum. Transpose "
    "materializes the full frame through the driver, so it is "
    "strictly a BOUNDED-table operation: always aggregate to the "
    "dimension grid first (5 x 3 cells here at any corpus scale) — "
    "transposing a fact table is the anti-pattern this op's shape "
    "documents. fn_unpivot is the inverse direction; agg_pivot is "
    "the values-to-columns sibling.",
)
def reshape_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    m = e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("sum_milli"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )
    # bounded |types| x 3 frame — the only safe transpose shape
    return m.transpose().orderBy("key")
