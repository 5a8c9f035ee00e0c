"""Catalog behaviors: managed-table registration (saveAsTable, reference
R14) and conf hygiene (table() must not churn session conf on a session
that already carries the right settings)."""

from __future__ import annotations

from solarflare_etl_pipeline_spark.catalog import (
    register_managed_tables,
    table,
)


def test_register_managed_tables_serves_sql(spark, sf_dir):
    register_managed_tables(spark, sf_dir, database="solarflare_test", tables=("region", "nation"))
    out = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM solarflare_test.nation n
        JOIN solarflare_test.region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).collect()
    assert len(out) == 5
    assert sum(r.n_nations for r in out) == 25
    # managed (not a temp view): survives catalog listing
    tables = {t.name for t in spark.catalog.listTables("solarflare_test")}
    assert {"region", "nation"} <= tables


def test_table_does_not_flip_conf(spark, sf_dir):
    """A get_spark-built session already has UTC + nanosAsLong: reading
    tables (including events) must leave both conf values unchanged."""
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    nanos_before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    table(spark, sf_dir, "events").count()
    table(spark, sf_dir, "orders").count()
    assert spark.conf.get("spark.sql.session.timeZone") == tz_before == "UTC"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) == nanos_before == "true"
