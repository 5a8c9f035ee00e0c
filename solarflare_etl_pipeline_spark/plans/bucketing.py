"""Bucketed tables: shuffle-free co-located joins (the 100 TB fact-fact
join strategy, SURVEY.md §4.3).

A sort-merge join between two tables bucketed on the join key by the
same bucket count needs NO exchange on either side — the map tasks read
matching buckets directly.  At 100 TB this turns the recurring
orders ⋈ lineitem shuffle (the dominant cost of every order-level
query) into a scan-side merge.

``join_bucketed`` is registered as a driver query: it materializes
bucketed copies of orders/lineitem with ``bucketBy(8, key).sortBy(key)``
(once per scale factor — table names are sf-scoped so one process can
serve several fixture scales without stale reads) and returns the joined
aggregate; ``tests/test_semantics.py::test_bucketed_join_no_shuffle``
asserts the executed plan contains no Exchange above either scan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.functions.numeric import (
    dsum_exact,
    price_dec,
    rate_dec,
    sql_dsum_exact,
    sql_price,
    sql_rate,
)
from solarflare_etl_pipeline_spark.registry import register

N_BUCKETS = 8


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write bucketed managed copies of orders/lineitem (idempotent per
    scale factor) and return their table names."""
    # (warehouse dir is a static conf — bucketed tables land in the
    # session's default spark-warehouse; fine for the demo/test)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    tag = _sf_tag(sf_dir)
    names = []
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"bkt_{tag}_{name}"
        names.append(tbl)
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
    return names[0], names[1]


def demo_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem on the bucketed key: zero-exchange sort-merge."""
    bkt_orders, bkt_lineitem = ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(bkt_orders)
    l = spark.table(bkt_lineitem)
    revenue = price_dec("l_extendedprice") * (1 - rate_dec("l_discount"))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            dsum_exact(revenue, "revenue"),
        )
    )


@register(
    "join_bucketed",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_lineitems,
               {sql_dsum_exact(f'{sql_price("l.l_extendedprice")} * (1 - {sql_rate("l.l_discount")})', 'revenue')}
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
    """,
    doc="Co-located fact-fact join: orders and lineitem materialized as bucketed "
    "tables (bucketBy(8, orderkey) + sortBy), then sort-merge joined with ZERO "
    "exchange below the join — the map tasks read matching buckets directly. At "
    "100 TB this is the canonical layout for the recurring orders ⋈ lineitem "
    "shuffle; the no-Exchange plan shape is asserted in "
    "tests/test_semantics.py::test_bucketed_join_no_shuffle.",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_bucketed_join(spark, sf_dir)
