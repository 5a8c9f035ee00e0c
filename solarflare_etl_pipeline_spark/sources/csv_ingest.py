"""CSV ingestion: delimited-text source with an explicit schema.

Rounds out the source-format surface (parquet scan, JSON payloads,
live HTTP, JDBC) with the one format every ETL intake still meets.
The reference's intake is JSON-over-HTTP (``/root/reference/dags/
etl.py:36-47``); CSV is the adjacent bulk-drop shape the same pipeline
consumes from object storage.

Spark-first mechanics this exercises:
  * explicit ``StructType`` schema — NO ``inferSchema`` (a second full
    pass over 100 TB just to guess types is the classic intake
    anti-pattern; schema comes from the contract, not the data);
  * ``header``/``quote``/``escape`` options on both the write and the
    read side, so delimiter-bearing strings survive the round trip;
  * malformed-row policy pinned to FAILFAST — at intake, silent
    NULL-filling (PERMISSIVE) turns data bugs into model bugs.

The registered query writes a CSV copy of ``customer`` once per
(process, sf) — same write-once discipline as
``sinks.ensure_partitioned_orders`` — reads it back through the typed
schema, and applies a filter+projection. The oracle recomputes the
expected result from the parquet view, so the round trip itself is
what is being certified (Java's Double.toString is shortest-repr
round-trippable, so doubles survive text exactly).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register

CUSTOMER_CSV_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

#: (abs sf_dir) -> path of the CSV copy this process already wrote.
_CUSTOMER_CSV: dict[str, str] = {}


def ensure_customer_csv(spark: SparkSession, sf_dir: str) -> str:
    """Write ``customer`` as headered CSV once per (process, sf)."""
    key = os.path.abspath(sf_dir)
    path = _CUSTOMER_CSV.get(key)
    if path is None:
        path = os.path.join(
            tempfile.gettempdir(),
            f"solarflare_customer_csv_{os.path.basename(key)}_{os.getpid()}",
        )
        (
            table(spark, sf_dir, "customer")
            .write.mode("overwrite")
            .option("header", True)
            .csv(path)
        )
        _CUSTOMER_CSV[key] = path
    return path


@register(
    "ingest_csv",
    oracle="""
        SELECT c_custkey,
               c_name,
               c_nationkey,
               c_acctbal,
               UPPER(c_mktsegment) AS segment_uc
        FROM customer
        WHERE c_acctbal > 0
    """,
    doc="Typed CSV ingestion: write customer as headered CSV (once per process), "
    "read back through an explicit StructType with mode=FAILFAST, filter + "
    "project. Certifies text round-trip fidelity for longs/ints/doubles/strings "
    "against the parquet-derived oracle. Scale notes: explicit schema avoids the "
    "inferSchema second scan; CSV splits by line so reads parallelize per block; "
    "FAILFAST surfaces malformed rows at intake instead of NULL-filling them.",
)
def ingest_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_customer_csv(spark, sf_dir)
    df = (
        spark.read.schema(CUSTOMER_CSV_SCHEMA)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(path)
    )
    return df.where(F.col("c_acctbal") > 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        F.upper("c_mktsegment").alias("segment_uc"),
    )


@register(
    "ingest_csv_corrupt",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_corrupt,
               CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN NULL ELSE n_chars END)
                    AS BIGINT) AS sum_chars_clean
        FROM documents
        GROUP BY lang
    """,
    doc="Malformed-CSV ingestion (PERMISSIVE + columnNameOfCorruptRecord) "
    "— the CSV sibling of ingest_json_corrupt: a comma-delimited feed "
    "is derived from documents with every doc_id % 11 == 0 line's "
    "numeric n_chars field replaced by a non-numeric token; the typed "
    "reader parses clean lines fully, lands each broken line's raw "
    "text in _corrupt_record, NULLs only the unparseable field, and "
    "the job never dies. Unlike the JSON case (whole record lost), "
    "CSV PERMISSIVE keeps the fields that did parse — doc_id and "
    "lang survive on corrupt rows, so the lang grouping is the REAL "
    "lang and the oracle certifies three things at once from the "
    "corruption rule alone: row conservation, per-lang quarantine "
    "counts, and that clean-row n_chars sums are untouched. "
    "Generated distributed (concat + conditional rewrite + text "
    "write); read is a narrow typed scan — the quarantine pattern at "
    "any scale.",
)
def ingest_csv_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import tempfile as _tempfile

    target = _os.path.join(
        _tempfile.gettempdir(),
        f"solarflare_corrupt_csv_{_os.path.basename(sf_dir.rstrip('/'))}_{_os.getpid()}.csv",
    )
    line = F.concat_ws(
        ",", F.col("doc_id"), F.col("lang"), F.col("n_chars")
    )
    corrupted = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat_ws(",", F.col("doc_id"), F.col("lang"), F.lit("XX")),
    ).otherwise(line)
    (
        table(spark, sf_dir, "documents")
        .select(corrupted.alias("value"))
        .write.mode("overwrite")
        .text(target)
    )
    schema = "doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING"
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(target)
    )
    return parsed.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("int"))
        .cast("long")
        .alias("n_corrupt"),
        F.sum("n_chars").cast("long").alias("sum_chars_clean"),
    )
