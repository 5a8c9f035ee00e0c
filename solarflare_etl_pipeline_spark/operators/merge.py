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


@register(
    "merge_scd2",
    oracle="""
        WITH changed AS (
            SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 10 = 0
        )
        SELECT c.c_custkey,
               1 AS version,
               c.c_mktsegment,
               c.c_acctbal,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               CASE WHEN ch.c_custkey IS NOT NULL
                    THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
               ch.c_custkey IS NULL AS is_current
        FROM customer c LEFT JOIN changed ch ON c.c_custkey = ch.c_custkey
        UNION ALL
        SELECT c_custkey,
               2 AS version,
               (SELECT c2.c_mktsegment FROM customer c2
                WHERE c2.c_custkey = changed.c_custkey) AS c_mktsegment,
               c_acctbal + 100.0 AS c_acctbal,
               TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               TRUE AS is_current
        FROM changed
    """,
    doc="Slowly-changing-dimension Type 2 — the versioned-history MERGE every "
    "warehouse dimension eventually needs (reference R7 keeps only the latest "
    "row; SCD2 keeps every version with validity intervals so facts join to "
    "the dimension AS OF their event time via join_range/join_asof): a change "
    "batch (10% of keys, new balance, effective 2024-06-01) closes the "
    "affected version-1 rows (valid_to set, is_current false) and appends "
    "open version-2 rows. Narrow CASE + union over one change-flag join — "
    "history grows by |changes|, not |dimension|. Validity bounds are TIMESTAMP "
    "(not DATE) end-to-end: Spark DATE reaches the driver's pandas canon as "
    "object-dtype datetime.date vs DuckDB's datetime64 — a guaranteed hash "
    "red (ORACLE_PARITY.md rule 19). At 100 TB partition the "
    "history by valid_from and the incremental append touches only the new "
    "date partition (sink_incremental_dedup's layout).",
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    changed_flag = F.col("c_custkey") % 10 == 0
    v1 = c.select(
        "c_custkey",
        F.lit(1).alias("version"),
        "c_mktsegment",
        "c_acctbal",
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.when(changed_flag, F.lit("2024-06-01").cast("timestamp")).alias("valid_to"),
        (~changed_flag).alias("is_current"),
    )
    v2 = c.where(changed_flag).select(
        "c_custkey",
        F.lit(2).alias("version"),
        "c_mktsegment",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("2024-06-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return v1.unionAll(v2)


@register(
    "merge_cdc_apply",
    oracle="""
        WITH log AS (
            SELECT o_orderkey AS k, 0 AS seq, 'B' AS op,
                   o_orderstatus AS status, o_totalprice AS price
            FROM orders WHERE o_orderkey % 100 < 90
            UNION ALL
            SELECT o_orderkey, 1, 'I', o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 100 >= 90
            UNION ALL
            SELECT o_orderkey, 2, 'U', 'X', o_totalprice * 1.1
            FROM orders WHERE o_orderkey % 10 = 3
            UNION ALL
            SELECT o_orderkey, 3, 'D', NULL, NULL
            FROM orders WHERE o_orderkey % 10 = 7
        )
        SELECT k AS o_orderkey, status, price, op AS last_op
        FROM log
        QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) = 1
           AND op <> 'D'
    """,
    doc="CDC changelog apply — the missing third of the merge family "
    "(merge_upsert: unordered U/I via full join; merge_scd2: history "
    "preservation; THIS: an ORDERED insert/update/delete log compacted "
    "and applied, the Debezium/binlog-consumer shape). The base "
    "snapshot enters as op 'B' at seq 0, the log carries I (new keys), "
    "U (status rewrite + repriced), and D (tombstones); the net state "
    "is one window pass — latest seq per key wins, tombstoned keys "
    "vanish. Compaction and apply are THE SAME single shuffle on the "
    "key: at 100 TB you compact the day's log first (log-sized "
    "window), then merge log-vs-snapshot with the snapshot bucketed on "
    "the key so only the log moves; the plan here fuses both because "
    "the fixture base is table-sized. Deletes are the part "
    "merge_upsert cannot express — a full-join CASE keeps unmatched "
    "target rows, while a tombstone must REMOVE them.",
)
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    base = o.where("o_orderkey % 100 < 90").select(
        F.col("o_orderkey").alias("k"),
        F.lit(0).alias("seq"),
        F.lit("B").alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    ins = o.where("o_orderkey % 100 >= 90").select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    upd = o.where("o_orderkey % 10 = 3").select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        F.lit("X").alias("status"),
        (F.col("o_totalprice") * 1.1).alias("price"),
    )
    dele = o.where("o_orderkey % 10 = 7").select(
        F.col("o_orderkey").alias("k"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("double").alias("price"),
    )
    from pyspark.sql import Window as W

    log = base.unionByName(ins).unionByName(upd).unionByName(dele)
    rn = F.row_number().over(W.partitionBy("k").orderBy(F.col("seq").desc()))
    return (
        log.withColumn("rn", rn)
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            F.col("k").alias("o_orderkey"),
            "status",
            "price",
            F.col("op").alias("last_op"),
        )
    )


@register(
    "join_point_in_time",
    oracle="""
        WITH dim AS (
            SELECT c_custkey, c_mktsegment AS segment,
                   TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
                   CASE WHEN c_custkey % 3 = 0
                        THEN TIMESTAMP '1997-01-01 00:00:00'
                        ELSE TIMESTAMP '9999-12-31 00:00:00'
                   END AS valid_to
            FROM customer
            UNION ALL
            SELECT c_custkey, c_mktsegment || '_v2' AS segment,
                   TIMESTAMP '1997-01-01 00:00:00' AS valid_from,
                   TIMESTAMP '9999-12-31 00:00:00' AS valid_to
            FROM customer WHERE c_custkey % 3 = 0
        )
        SELECT d.segment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders o
        JOIN dim d ON d.c_custkey = o.o_custkey
                  AND o.o_orderdate >= d.valid_from
                  AND o.o_orderdate < d.valid_to
        GROUP BY d.segment
    """,
    doc="Point-in-time (temporal) join against an SCD2 dimension: each "
    "order joins the customer-segment version that was valid ON ITS "
    "ORDER DATE (half-open [valid_from, valid_to) intervals; a v2 "
    "version splits history at 1997 for every third customer) — the "
    "no-leakage join feature stores and training-data builds require: "
    "joining current attributes onto historical facts leaks the "
    "future into features, the classic offline/online skew bug. The "
    "version history is derived in-query so both engines see one "
    "input. Plan: the equi key (custkey) drives ONE hash join; the "
    "interval predicate is a post-join filter on the (few) versions "
    "per key — never a range cross product, because SCD2 guarantees "
    "O(versions) rows per key. Integer-cents rollup by effective "
    "segment → hash-exact.",
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    far = F.lit("9999-12-31").cast("timestamp")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.lit("1997-01-01").cast("timestamp"),
        )
        .otherwise(far)
        .alias("valid_to"),
    )
    v2 = c.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_v2")).alias("segment"),
        F.lit("1997-01-01").cast("timestamp").alias("valid_from"),
        far.alias("valid_to"),
    )
    dim = v1.unionAll(v2)
    o = table(spark, sf_dir, "orders")
    j = o.join(
        dim,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    )
    return j.groupBy("segment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
    )
