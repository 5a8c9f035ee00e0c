"""Time-series operators over the ``events`` stream: gap-filled
resampling (LOCF) and OHLC downsampling.

Reference anchor: the reference's data IS a time series (solar-flare
events with begin/peak/end timestamps re-fetched daily,
``/root/reference/dags/etl.py:36-45``); an analyst consuming that table
immediately needs regular-grid resampling (dashboards, joins against
other hourly feeds) and per-bucket summaries. Neither is a plain
``groupBy``: resampling must MATERIALIZE the empty buckets and carry
the last observation forward across them.

Scale notes (100 TB): both operators shuffle once on the entity key
(hash partition by ``user_id``); the spine explode is narrow (generated
from each key's own min/max — no cross-key data movement) and the LOCF
window runs inside the same partitioning. Bucket counts per key are
bounded by the time span (720 hourly buckets/month) regardless of raw
event volume, so the post-aggregation state is calendar-sized, not
data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register


@register(
    "ts_gapfill_locf",
    oracle="""
        WITH b AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                       AS hr,
                   MAX(value) AS obs_value,
                   COUNT(*) AS n_obs
            FROM events
            GROUP BY 1, 2
        ),
        spine AS (
            SELECT user_id,
                   UNNEST(GENERATE_SERIES(MIN(hr), MAX(hr), INTERVAL 1 HOUR))
                       AS hr
            FROM b
            GROUP BY user_id
        )
        SELECT s.user_id,
               s.hr AS hour_ts,
               CAST(COALESCE(b.n_obs, 0) AS BIGINT) AS n_obs,
               b.obs_value IS NULL AS is_gap,
               LAST_VALUE(b.obs_value IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM spine s
        LEFT JOIN b ON s.user_id = b.user_id AND s.hr = b.hr
    """,
    doc="Regular-grid resampling with last-observation-carried-forward: "
    "per user, an hourly spine is GENERATED from that user's own min/max "
    "bucket (sequence + explode — no cross-key shuffle to build it), "
    "observed buckets (max(value), deterministic) are left-joined on, and "
    "gaps are filled by last(value, ignorenulls) over an unbounded-"
    "preceding window. filled_value COPIES an input double (no float "
    "arithmetic), so the hash is engine-stable without a decimal detour. "
    "One hash shuffle on user_id serves the bucket agg, the spine join, "
    "and the LOCF window; per-key state is calendar-sized (720 buckets/"
    "month), not event-sized — the 100 TB plan is this plan.",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    buckets = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.max("value").alias("obs_value"),
        F.count("*").alias("n_obs"),
    )
    spine = (
        buckets.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    joined = spine.join(buckets, ["user_id", "hr"], "left")
    w = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "user_id",
        F.col("hr").alias("hour_ts"),
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        F.col("obs_value").isNull().alias("is_gap"),
        F.last("obs_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "ts_ohlc_bars",
    oracle="""
        SELECT user_id,
               CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS hour_ts,
               ARG_MIN(value, CAST(ts AS TIMESTAMP)) AS open_value,
               ARG_MAX(value, CAST(ts AS TIMESTAMP)) AS close_value,
               MIN(value) AS low_value,
               MAX(value) AS high_value,
               COUNT(*) AS n_obs
        FROM events
        GROUP BY 1, 2
    """,
    doc="OHLC downsampling (open/high/low/close per user-hour): "
    "first/last-in-bucket via min_by/max_by on the event timestamp plus "
    "exact min/max — one partial+final hash aggregate, every accumulator "
    "mergeable (arg-min carries (ts, value) pairs through the merge), so "
    "the shuffle moves one row per (partition, user, hour). Deterministic "
    "because (user_id, ts) is unique in the fixtures — pinned by "
    "tests/test_semantics.py::test_user_ts_unique_for_ohlc, the same "
    "discipline as agg_argminmax. All outputs copy or compare input "
    "doubles (no float arithmetic) — hash-stable without decimal detours.",
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.min_by("value", "ts").alias("open_value"),
        F.max_by("value", "ts").alias("close_value"),
        F.min("value").alias("low_value"),
        F.max("value").alias("high_value"),
        F.count("*").alias("n_obs"),
    )
