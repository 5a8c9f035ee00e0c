"""Central query registry — single source of truth for the driver contract.

Every operator from SURVEY.md §2.2 registers here as a ``QuerySpec``:
a name, a PySpark callable ``(spark, sf_dir) -> DataFrame``, and (when
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the
same parquet tables.  ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry.

Oracle-parity rules observed by every registered query:
  * every computed/aggregate column is aliased identically in the Spark
    code and the SQL text (the driver hashes values under sorted column
    names);
  * double-typed aggregates route through exact decimal accumulation
    and cast back to double (see ``functions.numeric``) so the hash is
    invariant to Spark-vs-DuckDB summation order;
  * results must be deterministic sets — ranking windows always break
    ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a ``(spark, sf_dir) -> DataFrame`` callable."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: fills REGISTRY)."""
    # Imports are deferred so `import solarflare_etl_pipeline_spark` stays
    # cheap; this function is the one place that pulls in the full surface.
    from solarflare_etl_pipeline_spark.operators import (  # noqa: F401
        core,
        joins,
        aggregates,
        windows,
        setops,
        dedup,
        asof,
        similarity,
        text,
        multimodal,
        udaf,
        subqueries,
        nulls,
        reshape,
        analytics,
    )
    from solarflare_etl_pipeline_spark import sinks  # noqa: F401
    from solarflare_etl_pipeline_spark.functions import scalar  # noqa: F401
    from solarflare_etl_pipeline_spark.sources import json_ingest  # noqa: F401
    from solarflare_etl_pipeline_spark.streaming import event_windows, stateful  # noqa: F401

    return REGISTRY
