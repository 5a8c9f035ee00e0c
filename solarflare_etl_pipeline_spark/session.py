"""SparkSession factory.

Local-mode settings tuned for the test harness (``local[N]``, one JVM)
while keeping every knob that matters at cluster scale explicit: AQE on
(runtime join re-planning + skew handling), UTC session timezone (oracle
parity), Arrow for any Python exchange, shuffle partitions sized to the
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "solarflare-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    At cluster scale the same config block applies unchanged except
    ``master`` and memory sizing; AQE + adaptive coalescing are the
    load-bearing settings (they re-plan joins to broadcast and split
    skewed partitions at runtime, which is what keeps the 100 TB plans
    stable without hand-tuning per query).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # Fixture regimes have varied across driver rounds: events.parquet
        # has shipped both as TIMESTAMP(NANOS) (rejected by the vectorized
        # reader unless read as int64 ns) and as timestamp[us] (reads as
        # TIMESTAMP_NTZ natively). The conf is harmless in the latter case;
        # catalog.table() handles BOTH by converting only when the column
        # actually arrives as bigint. Set at construction so per-query code
        # never flips session conf mid-plan.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source filter pushdown (sources/python_source.py);
        # default-off in Spark 4, required when a reader implements
        # pushFilters. Also ensured defensively for foreign sessions.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # \r-chunked stage-progress bars interleave with stdout under
        # captured output (they clipped the BENCH_r06 JSON line); the
        # bench/driver contract needs a clean final stdout line.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
