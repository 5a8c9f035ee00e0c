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
