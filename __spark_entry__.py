"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``solarflare_etl_pipeline_spark.registry`` — the single
source of truth where every operator registers its PySpark callable and
(when SQL-expressible) its DuckDB-oracle SQL.  See SURVEY.md §2.2 for
the inventory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solarflare_etl_pipeline_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference ETL re-expressed as one
    lazy Spark plan (ingest → project → keyed dedup → daily rollup)."""
    specs = load_all()
    return specs["flagship_daily_events"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; rows-only ops are omitted."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
