"""MERGE INTO (upsert) semantics as a pure DataFrame plan.

The reference's sink-side idempotence is row-at-a-time ``INSERT ... ON
CONFLICT DO NOTHING`` (``/root/reference/dags/etl.py:76-89``); the
general form every warehouse pipeline eventually needs is three-way
MERGE: update matched rows, insert unmatched source rows, keep
unmatched target rows. Spark has no MERGE statement outside table
formats (Delta/Iceberg), but the semantics are exactly one full outer
join on the merge key + per-column CASE — which is also precisely what
those formats execute underneath, minus their file-rewrite bookkeeping.

Scale notes: one shuffle join on the merge key, both sides pruned to
the merge columns; AQE handles a skewed merge key. With the target
bucketed on the key (plans/bucketing.py) the target-side shuffle
disappears — the same co-location the sink_* write path sets up. The
streaming analogue (foreachBatch keyed upsert) is exercised in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register


@register(
    "merge_upsert",
    oracle="""
        WITH src AS (
            SELECT o_orderkey, 'U' AS s_status, o_totalprice AS s_price
            FROM orders WHERE o_orderkey % 100 < 10
            UNION ALL
            SELECT -o_orderkey - 1 AS o_orderkey, 'N' AS s_status,
                   o_totalprice AS s_price
            FROM orders WHERE o_orderkey % 100 >= 95
        )
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.s_status
                    ELSE t.o_orderstatus END AS o_orderstatus,
               CASE WHEN t.o_orderkey IS NULL THEN s.s_price
                    ELSE t.o_totalprice END AS o_totalprice,
               CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                         THEN 'update'
                    WHEN t.o_orderkey IS NULL THEN 'insert'
                    ELSE 'keep' END AS merge_action
        FROM orders t
        FULL JOIN src s ON t.o_orderkey = s.o_orderkey
    """,
    doc="Three-way MERGE INTO (WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT / "
    "else keep) as a single full-outer join + per-column CASE — the plan Delta/"
    "Iceberg MERGE executes under the hood. Source = a deterministic update set "
    "(10% of keys get status 'U') plus an insert set (negated keys, status 'N'), "
    "both derived from orders so the oracle reproduces them exactly. "
    "merge_action makes the three-way decision itself part of the checked output.",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    target = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(True).alias("in_t")
    )
    updates = o.where(F.col("o_orderkey") % 100 < 10).select(
        "o_orderkey",
        F.lit("U").alias("s_status"),
        F.col("o_totalprice").alias("s_price"),
    )
    inserts = o.where(F.col("o_orderkey") % 100 >= 95).select(
        (-F.col("o_orderkey") - 1).alias("o_orderkey"),
        F.lit("N").alias("s_status"),
        F.col("o_totalprice").alias("s_price"),
    )
    src = updates.unionAll(inserts).withColumn("in_s", F.lit(True))
    merged = target.join(src, "o_orderkey", "full")
    return merged.select(
        "o_orderkey",
        F.when(F.col("in_s").isNotNull(), F.col("s_status"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("in_t").isNull(), F.col("s_price"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("in_t").isNotNull() & F.col("in_s").isNotNull(), F.lit("update"))
        .when(F.col("in_t").isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("merge_action"),
    )
