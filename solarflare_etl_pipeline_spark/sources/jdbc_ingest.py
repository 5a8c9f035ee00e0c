"""JDBC *source*: parallel partitioned reads from a relational database.

Complements ``sinks.sink_jdbc`` (the write side): the reference's only
database access is per-row INSERTs through an Airflow PostgresHook
(``/root/reference/dags/etl.py:76-89``); reading back is out of its
scope entirely — this source is part of the mandate widening (a
complete engine ingests FROM operational stores too).

Scale notes: a naive ``spark.read.jdbc(url, table)`` is a SINGLE
connection pulling the whole table through one task.  The partitioned
form (``partitionColumn``/``lowerBound``/``upperBound``/
``numPartitions``) issues one range-predicate query per partition in
parallel — at 100 TB you bound ``numPartitions`` by what the database
can serve concurrently and align ranges with the table's primary-key
clustering so each range query is an index range scan, not a full scan
per partition.  Pushdown: Catalyst ships filters and column pruning
into the generated SQL (inspect with .explain: PushedFilters appear in
the JDBCRelation scan).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.functions.numeric import dsum
from solarflare_etl_pipeline_spark.registry import register

#: pid-scoped Derby database dir (embedded Derby locks the db per JVM;
#: pid-scoping keeps concurrent engine processes off each other's files).
_DB: dict[str, bool] = {}


def _derby_url() -> str:
    return (
        "jdbc:derby:"
        + os.path.join(tempfile.gettempdir(), f"solarflare_derby_src_{os.getpid()}")
        + ";create=true"
    )


def _ensure_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Load a projected slice of ``orders`` into Derby once per
    (process, sf); returns the JDBC url."""
    url = _derby_url()
    key = os.path.abspath(sf_dir)
    if not _DB.get(key):
        (
            table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", "orders_src")
            .option("batchsize", "10000")
            .mode("overwrite")
            .save()
        )
        _DB[key] = True
    return url


@register(
    "ingest_jdbc",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_totalprice > 100000
        GROUP BY o_orderstatus
    """,
    doc="Parallel partitioned JDBC source: orders loaded into embedded Derby "
    "(the driver Spark ships), read back with partitionColumn=o_orderkey over "
    "8 ranges — 8 concurrent range-predicate queries instead of one "
    "whole-table connection — with the price filter pushed into the remote "
    "SQL. The aggregate then runs distributed over the 8 fetched partitions.",
)
def ingest_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = _ensure_orders_table(spark, sf_dir)
    bounds = (
        table(spark, sf_dir, "orders")
        .agg(F.min("o_orderkey"), F.max("o_orderkey"))
        .first()
    )
    back = spark.read.jdbc(
        url,
        "orders_src",
        column="o_orderkey",
        lowerBound=int(bounds[0]),
        upperBound=int(bounds[1]) + 1,
        numPartitions=8,
    )
    return (
        back.where(F.col("o_totalprice") > 100000)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_price"))
    )
