"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
synthetic event generator with real partition parallelism and filter
pushdown INTO the source.

Reference anchor: the reference's source is an HTTP API returning JSON
(``/root/reference/dags/etl.py:36-45``) — an *imperative* source outside
the engine. The Python Data Source API is the Spark-native way to bring
such a source inside the plan: the scan parallelizes over
``InputPartition``s (each worker fetches/generates its slice), Catalyst
prunes columns and — because ``pushFilters`` is implemented — pushes
supported predicates into the source so unwanted rows are never
generated (for an HTTP source: never fetched).

Scale notes: one ``InputPartition`` per API page / shard / day makes a
remote source scan horizontally like a parquet directory; pushed filters
cut the transfer at the origin. Generation here is a pure function of
``event_id``, so the scan is deterministic at any parallelism — and the
DuckDB oracle can restate it in closed form (RANGE) to certify the whole
path end to end.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)

from solarflare_etl_pipeline_spark.functions.numeric import dsum, sql_dsum
from solarflare_etl_pipeline_spark.registry import register

EVENT_TYPES = ("view", "click", "purchase", "scroll")


def synth_row(event_id: int) -> tuple[int, int, str, float]:
    """The generator contract: every field a pure function of event_id
    (mirrored literally by the SQL oracle)."""
    return (
        event_id,
        event_id % 97,
        EVENT_TYPES[event_id % 4],
        (event_id % 1000) * 0.5,  # exact binary double — portable hash
    )


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))
        self.event_type: str | None = None  # pushed-down equality, if any

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept ``event_type = <literal>``; everything else stays in the
        plan. Accepted ⇒ matching rows are the only rows ever generated."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                self.event_type = f.value
            else:
                yield f  # unsupported — Spark keeps a post-scan Filter

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        lo = partition.value * per
        hi = min(lo + per, self.n_rows)
        if self.event_type is None:
            start, step = lo, 1
        else:
            # event_type cycles with period 4: jump straight to matches
            want = EVENT_TYPES.index(self.event_type)
            start, step = lo + (want - lo) % 4, 4
        for event_id in range(start, hi, step):
            yield synth_row(event_id)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — options: n_rows,
    n_partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader(self.options)


def synthetic_events(spark: SparkSession, n_rows: int = 10_000, n_partitions: int = 8) -> DataFrame:
    from solarflare_etl_pipeline_spark.catalog import _ensure_conf

    # required whenever a reader implements pushFilters (default-off);
    # set-if-different so a foreign (driver) session gets fixed up too
    _ensure_conf(spark, "spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", str(n_rows))
        .option("n_partitions", str(n_partitions))
        .load()
    )


@register(
    "ingest_python_source",
    oracle=f"""
        WITH gen AS (
            SELECT UNNEST(RANGE(0, 10000)) AS event_id
        )
        SELECT event_id % 97 % 10 AS user_bucket,
               COUNT(*) AS n_events,
               {sql_dsum('(event_id % 1000) * 0.5', 'total_value')}
        FROM gen
        WHERE event_id % 4 = 0
        GROUP BY 1
    """,
    doc="Scan through the custom Python Data Source: 10k synthetic events "
    "generated across 8 InputPartitions, the event_type='view' predicate "
    "pushed INTO the source (pushFilters — non-matching rows are never "
    "generated; asserted in tests/test_plan_audit.py), then a per-bucket "
    "aggregate. The oracle regenerates the same rows in closed form "
    "(RANGE + the identical field arithmetic; 'view' ≡ event_id % 4 = 0), "
    "certifying partition slicing, pushdown stepping, and field generation "
    "byte-for-byte.",
)
def ingest_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = synthetic_events(spark)
    return (
        df.where(F.col("event_type") == "view")
        .groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
    )
