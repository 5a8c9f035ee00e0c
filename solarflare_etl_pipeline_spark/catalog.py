"""Table access for the driver's synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an ``sf_dir``.

``table()`` is the single scan entry point so every operator inherits
the same scan behavior: schema from the parquet footer, Catalyst
predicate pushdown / column pruning into the scan (verify with
``df.explain`` → ``PushedFilters`` / ``ReadSchema``).

At 100 TB the only change is the path layout: fact tables become
date-partitioned directories (``.../lineitem/l_shipdate=.../*.parquet``)
and the identical ``spark.read.parquet`` call picks up partition
pruning for free.  ``DIM_TABLES`` marks the always-broadcastable side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables that stay ~KB-to-MB at any scale factor (region/nation
#: are fixed-cardinality; supplier/part grow sub-linearly) → always safe to
#: broadcast in joins against the fact tables.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})


def _ensure_conf(spark: SparkSession, key: str, value: str) -> None:
    """Set a session conf only when it differs — sessions built by
    ``session.get_spark`` already carry these at construction, so the
    common path is a read, not a mutation (no conf flips mid-plan on a
    shared session); a foreign session (the driver's) still gets fixed
    up on first table access."""
    try:
        current = spark.conf.get(key, None)
    except Exception:
        current = None
    if current != value:
        spark.conf.set(key, value)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Raises if the name is unknown (typo guard).

    ``events.ts`` has shipped in two parquet encodings across driver
    fixture generations: TIMESTAMP(NANOS) (which Spark's vectorized
    reader rejects — the nanosAsLong conf reads it as raw int64 ns and
    we truncate to microsecond timestamps below) and plain
    ``timestamp[us]`` with no timezone (reads natively as
    TIMESTAMP_NTZ; the bigint branch below is skipped). Both end as a
    microsecond-precision timestamp column matching DuckDB's
    ``CAST(ts AS TIMESTAMP)`` truncation on the oracle side. Operators
    must therefore compare ``ts`` natively (timestamp + INTERVAL), never
    via numeric epoch casts — TIMESTAMP_NTZ→DOUBLE is an
    AnalysisException (tests/test_fixture_regimes.py covers both
    encodings).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Parity with the DuckDB oracle (naive-UTC timestamps) regardless of
    # which session the driver hands us.
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(path)


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan a dimension table wrapped in a broadcast hint."""
    if name not in DIM_TABLES:
        raise KeyError(f"{name!r} is not a dimension table: {sorted(DIM_TABLES)}")
    return F.broadcast(table(spark, sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the ``spark.sql`` path)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_managed_tables(
    spark: SparkSession,
    sf_dir: str,
    database: str = "solarflare",
    tables: tuple[str, ...] = TABLES,
) -> None:
    """Persist fixtures as managed catalog tables via ``saveAsTable``
    (reference R14: the starter DAG materializes a named dataset into the
    metastore, ``/root/reference/dags/exampledag.py:38-41``). Unlike temp
    views these survive the session and serve any ``spark.sql`` query
    without per-query setup; on a cluster the same call against a Hive
    metastore / Unity-style catalog is the production path."""
    import shutil

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    for name in tables:
        spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")
        # Local-mode only: with the default in-memory catalog, a previous
        # process's managed-table directory survives as a stale location
        # the new catalog doesn't know about — clear it so saveAsTable
        # doesn't refuse. A real metastore makes DROP TABLE sufficient.
        stale = os.path.join(warehouse, f"{database}.db", name)
        if os.path.exists(stale):
            shutil.rmtree(stale)
        table(spark, sf_dir, name).write.mode("overwrite").saveAsTable(f"{database}.{name}")


def repartition_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition with the partition count PINNED to the cluster's
    default parallelism — skipped when the input is already parallel.

    ``df.repartition(cols...)`` without a count leaves the exchange
    eligible for AQE partition coalescing, which decides by SHUFFLE BYTES
    — the wrong metric for compute-dense downstream stages (shingle
    explodes, signature aggregation, per-row crypto hashing), where a few
    MB of text fan out into orders of magnitude more work. Measured at
    sf0.1: AQE coalesced the post-repartition stage to ONE task on 32
    cores and the simhash signature pass ran 2x slower. An explicit count
    (REPARTITION_BY_NUM) is exempt from coalescing, so the compute stage
    keeps cluster-wide parallelism at any data size.

    r13: when the input ALREADY has >= default-parallelism partitions
    (a 100 TB table is thousands of splits), the repartition is pure
    shuffle cost — skip it. Locally the fixtures are single-row-group
    parquet (every scan is ONE task — the guide §2.5 unsplittable-input
    case), so the repartition still fires where it matters. The check
    compiles the physical plan but runs no job.

    CONTRACT (ADVICE r13): this helper guarantees PARALLELISM ONLY —
    when the skip branch fires, rows are NOT hash-clustered by ``cols``.
    Every call site must treat the keys as a locality hint for compute
    spread, never as a co-location guarantee; a caller that needs key
    clustering must call ``df.repartition(cols...)`` itself."""
    from pyspark.errors import AnalysisException

    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= n:
            return df
    except AnalysisException:
        pass  # un-plannable edge (streaming source): keep the repartition
    return df.repartition(n, *cols)
