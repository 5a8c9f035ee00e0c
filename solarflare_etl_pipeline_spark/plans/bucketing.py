"""Bucketed tables: shuffle-free co-located joins (the 100 TB fact-fact
join strategy, SURVEY.md §4.3).

A sort-merge join between two tables bucketed on the join key by the
same bucket count needs NO exchange on either side — the map tasks read
matching buckets directly.  At 100 TB this turns the recurring
orders ⋈ lineitem shuffle (the dominant cost of every order-level
query) into a scan-side merge.

``demo_bucketed_join`` materializes bucketed copies of orders/lineitem
with ``bucketBy(8, key).sortBy(key)`` and returns the joined aggregate;
``tests/test_semantics.py::test_bucketed_join_no_shuffle`` asserts the
executed plan contains no Exchange above either scan.  Not registered
as a driver query: it writes managed tables (driver queries must be
side-effect-free reads of the shared fixtures; the parquet/JDBC sink
round-trips already cover write paths).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.functions.numeric import dsum

N_BUCKETS = 8


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> None:
    """Write bucketed managed copies of orders/lineitem (idempotent)."""
    # (warehouse dir is a static conf — bucketed tables land in the
    # session's default spark-warehouse; fine for the demo/test)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    import shutil

    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"bkt_{name}"
        if not spark.catalog.tableExists(tbl):
            # the session catalog is in-memory: a previous process may
            # have left the warehouse directory behind without catalog
            # metadata — clear it or saveAsTable refuses the location
            leftover = os.path.join(
                spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), tbl
            )
            shutil.rmtree(leftover, ignore_errors=True)
            (
                table(spark, sf_dir, name)
                .write.mode("overwrite")
                .bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(tbl)
            )


def demo_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem on the bucketed key: zero-exchange sort-merge."""
    ensure_bucketed_tables(spark, sf_dir)
    o = spark.table("bkt_orders")
    l = spark.table("bkt_lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )
