"""Deduplication operators: keyed first-wins, idempotent anti-join append,
exact text dedup.

Reference anchor: R7 — the keyed deduplicating sink
(``/root/reference/dags/etl.py:66-89``: one INSERT per row with
``ON CONFLICT (flr_id) DO NOTHING``, unique key declared at
``dags/etl.py:23``; cross-run idempotence over overlapping 30-day
windows per ``README.md:74``).  Here the same semantics are one
shuffle each, instead of O(N) network round-trips:

  * within-batch dedup  → rank-1-per-key (deterministic first-wins);
  * cross-batch dedup   → left-anti join against existing keys;
  * content dedup       → hash(text) as the key (LLM-pipeline mandate).

Scale notes: rank-1-per-key is one hash shuffle on the key — strictly
cheaper than a sort-based distinct.  ``dropDuplicates`` would pick an
*arbitrary* row per key (fine in production, not oracle-checkable), so
the registered form makes first-wins explicit with a total order.  The
anti-join's build side is keys-only (projected before the join), which
at 100 TB is the difference between shuffling the full table and
shuffling an 8-byte column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register


@register(
    "dedup_key",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
        FROM (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_orderkey, l_linenumber
                       ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice
                   ) AS rn
            FROM lineitem
        ) WHERE rn = 1
    """,
    doc="Keyed first-wins dedup on (l_orderkey, l_linenumber) — deterministic "
    "representative via total order (reference R7's ON CONFLICT DO NOTHING).",
)
def dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    return (
        l.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_antijoin",
    oracle="""
        SELECT b.event_id, CAST(b.ts AS TIMESTAMP) AS ts, b.user_id, b.event_type, b.value
        FROM events b
        WHERE b.ts >= TIMESTAMP '2024-01-10'
          AND NOT EXISTS (
              SELECT 1 FROM events e
              WHERE e.ts < TIMESTAMP '2024-01-10' AND e.event_id = b.event_id
          )
    """,
    doc="Idempotent append: an overlapping re-fetch batch minus already-loaded keys "
    "(reference R7 cross-run semantics, README.md:74 — the 30-day overlapping window). "
    "Existing side projected to keys-only before the anti join.",
)
def dedup_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    cut = "2024-01-10"
    batch = e.where(F.col("ts") >= cut).select("event_id", "ts", "user_id", "event_type", "value")
    existing_keys = e.where(F.col("ts") < cut).select("event_id")
    return batch.join(existing_keys, "event_id", "left_anti")


@register(
    "llm_dedup_exact",
    oracle="""
        SELECT doc_id, lang, source, n_chars, fingerprint
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   SHA256(text) AS fingerprint,
                   ROW_NUMBER() OVER (PARTITION BY SHA256(text) ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    doc="Exact content dedup: sha256(text) grouping, lowest doc_id wins. At 100 TB the "
    "hash (32 bytes) shuffles instead of the document bodies.",
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        d.withColumn("fingerprint", F.sha2("text", 256))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "fingerprint")
    )


@register(
    "llm_dedup_exact_stats",
    oracle="""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT SHA256(text)) AS n_distinct,
               COUNT(*) - COUNT(DISTINCT SHA256(text)) AS n_duplicates
        FROM documents
    """,
    doc="Corpus-level duplication metrics off the same content hash.",
)
def llm_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").withColumn("h", F.sha2("text", 256))
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("h").alias("n_distinct"),
        (F.count("*") - F.countDistinct("h")).alias("n_duplicates"),
    )


@register(
    "dedup_keep_best",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY SHA256(text)
                       ORDER BY n_chars DESC, doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    doc="Quality-preferring exact dedup: within each content-hash group "
    "the LONGEST copy survives (ties to the lowest doc_id) — the "
    "curation policy when duplicates differ in truncation (a scraped "
    "page and its cut-off mirror hash differently only if bytes "
    "differ; when a family is defined by near-dup clustering the same "
    "keep-best rank runs per cluster_id, see llm_corpus_filter). "
    "Completes the dedup survivorship triple: first-wins (dedup_key), "
    "last-wins (dedup_keep_last), best-wins (here) — all the same "
    "one-shuffle rank-and-filter plan, which Spark lowers to a partial "
    "WindowGroupLimit below the exchange (the sample_reservoir_per_"
    "group property), so only one candidate row per partition-group "
    "ships at any scale.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy(
        F.desc("n_chars"), "doc_id"
    )
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "llm_influence_dedup_weights",
    oracle="""
        WITH fam AS (
            SELECT doc_id, MD5(text) AS h FROM documents
        ),
        sizes AS (
            SELECT h, CAST(COUNT(*) AS BIGINT) AS family_size,
                   CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
            FROM fam GROUP BY h
        )
        SELECT f.doc_id, s.family_size,
               f.doc_id = s.canonical_doc AS is_canonical,
               CAST(1000000 // s.family_size AS BIGINT) AS weight_ppm
        FROM fam f JOIN sizes s ON s.h = f.h
        ORDER BY f.doc_id
    """,
    doc="Duplicate-aware TRAINING WEIGHTS — the soft alternative to "
    "dropping duplicates (llm_dedup_exact removes rows; weighting "
    "keeps them all but makes each duplicate FAMILY count once in "
    "the loss, the standard trick when dedup would starve a domain): "
    "per-doc weight = 1/family_size in exact ppm off the md5 family "
    "census, with the canonical member flagged (min doc_id — the row "
    "an exporter keeps if it hard-dedups after all). Sum of weights "
    "over a family is <= 1e6 by exactly the truncation remainder — "
    "an invariant consumers can assert. Plan: one md5 map, one "
    "family-size aggregate, one equi-join back — the llm_dedup_exact "
    "shuffle economics with the weight as a derived column.",
)
def llm_influence_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    sizes = d.groupBy("h").agg(
        F.count("*").cast("long").alias("family_size"),
        F.min("doc_id").cast("long").alias("canonical_doc"),
    )
    return (
        d.join(sizes, "h")
        .select(
            "doc_id",
            "family_size",
            (F.col("doc_id") == F.col("canonical_doc")).alias("is_canonical"),
            F.expr("CAST(1000000 DIV family_size AS BIGINT)").alias(
                "weight_ppm"
            ),
        )
        .orderBy("doc_id")
    )
