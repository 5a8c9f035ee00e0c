"""Grouped-aggregate pandas UDAF + the first-class ``spark.sql`` path.

SURVEY.md §2.2 closes with "UDAF/UDTF surface: cover minimally via
pandas_udf grouped-agg and mapInPandas" (the UDTF-like path lives in
``operators/multimodal.py``); §3.3 keeps ad-hoc ``spark.sql`` over
registered views first-class.

Determinism note: a float sum inside pandas is order-dependent, and
group rows arrive in shuffle order — so the UDAF does integer-cents
arithmetic (order-independent) and divides once at the end, keeping it
oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import register_views, table
from solarflare_etl_pipeline_spark.functions.numeric import sql_dsum_exact, sql_price, sql_rate
from solarflare_etl_pipeline_spark.registry import register


@register(
    "udaf_grouped",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
                   / COUNT(o_totalprice) AS mean_price,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Grouped-agg pandas UDAF (Arrow-batched): exact mean via integer-cents "
    "accumulation — order-independent, hence oracle-checkable. The escape hatch for "
    "aggregations Catalyst can't express (reference R4's arbitrary Python, grouped). "
    "Scale shape (VERDICT r8 task #4): a grouped pandas UDAF materializes the WHOLE "
    "group per call, and o_orderpriority is a ~5-value enum — corpus/5 rows per group "
    "at any scale, the canonical grouped-map OOM. So the Python stage groups on the "
    "data-scale composite (o_orderpriority, o_custkey) — per-group cardinality is a "
    "customer's orders within one priority, bounded and scale-invariant — emitting "
    "mergeable partials (cents sum + count), and a second-level JVM aggregate "
    "re-combines to the enum grain. Exactness is preserved because integer-cents "
    "partials merge associatively.",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("long")
    def cents_sum(v: pd.Series) -> int:
        # integer cents: order-independent sum (2-decimal money is exact)
        return int((v * 100).round().astype("int64").sum())

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas and JVM aggregates in one agg()
        # — count comes from a second pandas UDAF
        return len(v)

    o = table(spark, sf_dir, "orders")
    # Python boundary at (priority, custkey) grain: bounded groups.
    partial = o.groupBy("o_orderpriority", "o_custkey").agg(
        cents_sum("o_totalprice").alias("cents"),
        n_rows("o_totalprice").alias("n"),
    )
    # JVM re-aggregate to the enum grain: exact long sums, one division.
    return partial.groupBy("o_orderpriority").agg(
        (F.sum("cents").cast("double") / 100.0 / F.sum("n")).alias("mean_price"),
        F.sum("n").alias("n_orders"),
    )


@register(
    "sql_adhoc",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               {sql_dsum_exact(f'{sql_price("l.l_extendedprice")} * (1 - {sql_rate("l.l_discount")})', 'revenue')}
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o.o_orderpriority
    """,
    doc="The interactive SQL entry point (reference §3.3: ad-hoc SELECT over the loaded "
    "table, documentation.md:402-418): same Catalyst plan as the DataFrame API, via "
    "spark.sql over registered views.",
)
def sql_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o.o_orderpriority
        """
    )


CHUNK_WORDS = 10


@register(
    "udtf_lateral_chunks",
    oracle=f"""
        WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
        SELECT doc_id,
               UNNEST(RANGE(0, CAST(CEIL(LEN(toks) / {CHUNK_WORDS}.0) AS INT)))
                   AS chunk_idx,
               UNNEST(LIST_TRANSFORM(
                   RANGE(0, CAST(CEIL(LEN(toks) / {CHUNK_WORDS}.0) AS INT)),
                   i -> ARRAY_TO_STRING(
                       toks[i * {CHUNK_WORDS} + 1 : i * {CHUNK_WORDS} + {CHUNK_WORDS}],
                       ' ')))
                   AS chunk_text,
               UNNEST(LIST_TRANSFORM(
                   RANGE(0, CAST(CEIL(LEN(toks) / {CHUNK_WORDS}.0) AS INT)),
                   i -> LEN(toks[i * {CHUNK_WORDS} + 1 : i * {CHUNK_WORDS} + {CHUNK_WORDS}])))
                   AS n_words
        FROM t
    """,
    doc=f"True Python UDTF (Spark 4 @udtf API) applied via LATERAL: each document "
    f"expands to {CHUNK_WORDS}-word chunks with ordinal and word count — the "
    f"row→table form the reference's dynamic task fan-out takes per element "
    f"(exampledag.py:38-41), and the API-surface complement to udf_scalar "
    f"(scalar), udaf_grouped (aggregate), udtf_grouped_state (grouped-map). "
    f"Row-at-a-time Python is the SLOW path by design here — the vectorized "
    f"equivalent is llm_chunk_docs (pure column expressions, in-row slicing); "
    f"use a UDTF only when per-row expansion logic genuinely needs Python "
    f"(sentencizers, parsers). Oracle: the same chunking in closed form.",
)
def udtf_lateral_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_words int")
    class DocChunks:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(0, (len(words) + CHUNK_WORDS - 1) // CHUNK_WORDS):
                piece = words[i * CHUNK_WORDS : (i + 1) * CHUNK_WORDS]
                yield i, " ".join(piece), len(piece)

    spark.udtf.register("doc_chunks", DocChunks)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_words "
        "FROM documents d, LATERAL doc_chunks(d.text) c"
    )


@register(
    "flagship_sql_corpus",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang, text,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens
            FROM documents
        ),
        kept AS (
            SELECT * FROM scored WHERE n_tokens BETWEEN 20 AND 2000
        ),
        dedup AS (
            SELECT doc_id, lang, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY SHA256(text)
                                      ORDER BY doc_id) AS rn
            FROM kept
        ),
        canon AS (SELECT doc_id, lang, n_tokens FROM dedup WHERE rn = 1),
        assigned AS (
            SELECT lang,
                   CASE WHEN CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4))
                                 AS INTEGER) % 10 < 9
                        THEN 'train' ELSE 'eval' END AS split,
                   n_tokens
            FROM canon
        )
        SELECT lang, split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total
        FROM assigned GROUP BY lang, split
    """,
    doc="The curation pipeline as ONE SQL STRING — the API-surface twin "
    "of flagship_training_corpus for teams that live in pure SQL: a "
    "four-CTE chain (token-count quality gate → sha256 exact dedup "
    "keeping the lowest doc_id → deterministic md5-bucket train/eval "
    "split → per-(lang, split) manifest) submitted through spark.sql "
    "over registered views, compiling to the same Catalyst plan the "
    "DataFrame flagship produces. Every construct is driver-proven "
    "(sha2/SHA256 r3, md5-bucket CONV arithmetic r3 via "
    "sample_hash_split, rule-19 SUM cast). One scan, one window "
    "shuffle on the content hash, one final tiny agg — the lazy-plan "
    "economics are identical in either API, which is the point.",
)
def flagship_sql_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH scored AS (
            SELECT doc_id, lang, text,
                   size(split(text, ' ')) AS n_tokens
            FROM documents
        ),
        kept AS (
            SELECT * FROM scored WHERE n_tokens BETWEEN 20 AND 2000
        ),
        dedup AS (
            SELECT doc_id, lang, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY sha2(text, 256)
                                      ORDER BY doc_id) AS rn
            FROM kept
        ),
        canon AS (SELECT doc_id, lang, n_tokens FROM dedup WHERE rn = 1),
        assigned AS (
            SELECT lang,
                   CASE WHEN CAST(CONV(SUBSTRING(md5(CAST(doc_id AS STRING)), 1, 4),
                                       16, 10) AS INT) % 10 < 9
                        THEN 'train' ELSE 'eval' END AS split,
                   n_tokens
            FROM canon
        )
        SELECT lang, split,
               COUNT(*) AS n_docs,
               SUM(n_tokens) AS n_tokens_total
        FROM assigned GROUP BY lang, split
        """
    )


@register(
    "udaf_arrow_grouped",
    # Quantization floor(value*1000) is one IEEE multiply + floor —
    # deterministic (rule 22's standard quantizer); everything after is
    # exact int64 in Arrow compute and exact BIGINT in the oracle.
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                   AS sum_milli,
               CAST(MIN(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                   AS min_milli,
               CAST(MAX(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                   AS max_milli
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Arrow-NATIVE grouped aggregation (Spark 4 applyInArrow): the "
    "zero-copy sibling of applyInPandas — each group arrives as a "
    "pyarrow.Table and is reduced with pyarrow.compute kernels, no "
    "pandas materialization, no Python-object row loop (the pandas "
    "bridge costs a full columnar->Series conversion per group; Arrow "
    "kernels run on the wire buffers directly, which is the right "
    "shape when the group function is itself vectorizable but not "
    "expressible in SQL — custom sketches, FFT libraries, tokenizers "
    "with Arrow bindings). Here the group reduction (count / sum / "
    "min / max of milli-quantized values) is deliberately also "
    "SQL-expressible so the entire Arrow path is oracle-certified. "
    "Scale shape (VERDICT r8 task #4): applyInArrow materializes the "
    "WHOLE group as one pyarrow.Table per call, and event_type is a "
    "~5-value enum — corpus/5 rows per group at any scale, the "
    "canonical grouped-map OOM. So the Arrow boundary groups on the "
    "data-scale composite (event_type, user_id) — per-group "
    "cardinality is one user's events of one type, bounded and "
    "scale-invariant — emitting mergeable partials (n / sum / min / "
    "max are all associative), and a second-level JVM aggregate "
    "re-combines to the enum grain. At 100 TB: bounded groups stream "
    "through executors one Arrow table at a time; the JVM re-agg is "
    "an ordinary map-side-combinable hash aggregate.",
)
def udaf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def reduce_group(t: pa.Table) -> pa.Table:
        milli = pc.cast(
            pc.floor(pc.multiply(t.column("value"), pa.scalar(1000.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": [t.column("event_type")[0].as_py()],
                "n": [t.num_rows],
                "sum_milli": [pc.sum(milli).as_py()],
                "min_milli": [pc.min(milli).as_py()],
                "max_milli": [pc.max(milli).as_py()],
            }
        )

    e = table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    # Arrow boundary at (event_type, user_id) grain: bounded groups.
    partial = e.groupBy("event_type", "user_id").applyInArrow(
        reduce_group,
        schema="event_type string, n long, sum_milli long,"
        " min_milli long, max_milli long",
    )
    # JVM re-aggregate to the enum grain: all four partials are mergeable.
    out = partial.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("sum_milli").alias("sum_milli"),
        F.min("min_milli").alias("min_milli"),
        F.max("max_milli").alias("max_milli"),
    )
    return out.orderBy("event_type")


@register(
    "sql_pipe_syntax",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                   AS value_milli
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
        HAVING COUNT(*) >= 2
        ORDER BY user_id
    """,
    doc="SQL PIPE syntax (Spark 4.0's |> operator chain, SPARK-49555) — "
    "the API-surface certification that the pipe-composed form "
    "(FROM ... |> WHERE ... |> AGGREGATE ... GROUP BY ... |> WHERE "
    "... |> ORDER BY) plans to the IDENTICAL Catalyst logical plan "
    "as classic SELECT: the oracle is the classic formulation, so "
    "hash equality proves the pipe parser's desugaring end to end "
    "(projection, aggregate, post-aggregate filter = HAVING, sort). "
    "Pipe syntax is the form interactive corpus exploration "
    "increasingly takes (BigQuery/Spark 4 share it); engine cost is "
    "zero — it is pure parser surface over the same plan.",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM events
        |> WHERE event_type = 'purchase'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_purchases,
                     CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                         AS value_milli
           GROUP BY user_id
        |> WHERE n_purchases >= 2
        |> ORDER BY user_id
        """
    )
