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


EWMA_K = 8  # truncated-kernel length; tail mass below (1/2)^8 ≈ 0.4%


def _ewma_oracle() -> str:
    num = " + ".join(
        f"COALESCE(LAG(value, {j}) OVER w * {0.5 ** j!r}, 0.0)" for j in range(EWMA_K)
    )
    den = " + ".join(
        f"(CASE WHEN LAG(value, {j}) OVER w IS NOT NULL THEN {0.5 ** j!r} ELSE 0.0 END)"
        for j in range(EWMA_K)
    )
    return f"""
        SELECT user_id, event_id, value,
               ROUND(({num}) / ({den}), 6) AS ewma8
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        )
    """


@register(
    "ts_ewma_kernel",
    oracle=_ewma_oracle(),
    doc=f"Exponentially-weighted moving average (alpha=0.5) via a TRUNCATED "
    f"{EWMA_K}-tap shift-register kernel: ewma_t = sum_j w_j*v_(t-j) / "
    f"sum_j w_j with w_j = 2^-j, lags materialized by {EWMA_K} LAG calls "
    f"inside ONE window pass and missing leading taps renormalized out. "
    f"The recursive EWMA is inherently sequential (each value depends on "
    f"the full prefix) — the truncated kernel is the distributed-safe "
    f"reformulation, with error bounded by the dropped tail mass "
    f"(1/2)^{EWMA_K} < 0.4%. Hash-exact across engines because every "
    f"weight is a power of two (multiplication exact), the additions are "
    f"written as the same left-to-right chain on both sides, and the "
    f"result is rounded to 6 decimals (rule 7). One hash shuffle on "
    f"user_id; all {EWMA_K} lags share a single window frame — at 100 TB "
    f"this is scan + one shuffle, state bounded by {EWMA_K} rows per key.",
)
def ts_ewma_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", j).over(w) for j in range(EWMA_K)]
    num = F.coalesce(lags[0] * F.lit(1.0), F.lit(0.0))
    den = F.when(lags[0].isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    for j in range(1, EWMA_K):
        wj = F.lit(0.5**j)
        num = num + F.coalesce(lags[j] * wj, F.lit(0.0))
        den = den + F.when(lags[j].isNotNull(), wj).otherwise(F.lit(0.0))
    return e.select(
        "user_id", "event_id", "value", F.round(num / den, 6).alias("ewma8")
    )


@register(
    "ts_zscore_anomaly",
    oracle="""
        WITH s AS (
            SELECT user_id, event_id, value,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS s1,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)
                            * CAST(FLOOR(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS s2,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_win
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW
            )
        )
        SELECT user_id, event_id, value, n_win,
               CAST((n_win * v3 - s1) * (n_win * v3 - s1) * (n_win - 1) * 1000
                    // (n_win * (n_win * s2 - s1 * s1)) AS BIGINT) AS z_sq_milli
        FROM s
        WHERE n_win >= 12
          AND (n_win * s2 - s1 * s1) > 0
          AND (n_win * v3 - s1) * (n_win * v3 - s1) * (n_win - 1)
              >= 9 * n_win * (n_win * s2 - s1 * s1)
    """,
    doc="Rolling z-score anomaly detection (|z| >= 3 against a trailing "
    "24-observation window, warm-up 12): the streaming-telemetry outlier "
    "gate. The entire test is EXACT INTEGER arithmetic — values are "
    "deterministically quantized to milli-units (FLOOR(value*1000), an "
    "IEEE-deterministic double op), window sum/sum-of-squares/count stay "
    "in BIGINT, and |z|>=3 is evaluated as the cross-multiplied inequality "
    "(n*v - s1)^2 * (n-1) >= 9 * n * (n*s2 - s1^2) — no float mean, no "
    "float stddev, so no engine-association or ulp-boundary flakes ever "
    "(window aggregates associate differently across engines — DuckDB "
    "segment-trees, Spark running frames — which float formulations "
    "inherit; integers don't care). z^2 is reported in exact milli-units "
    "by the same integer division. One hash shuffle on user_id, "
    "constant per-row state (24-row frame) — scan-speed at 100 TB.",
)
def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, Window.currentRow)
    )
    s = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    ).select(
        "*",
        F.sum("v3").over(wf).alias("s1"),
        F.sum(F.col("v3") * F.col("v3")).over(wf).alias("s2"),
        F.count("*").over(wf).alias("n_win"),
    )
    dev = F.col("n_win") * F.col("v3") - F.col("s1")
    m = F.col("n_win") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        s.where(
            (F.col("n_win") >= 12)
            & (m > 0)
            & (dev * dev * (F.col("n_win") - 1) >= 9 * F.col("n_win") * m)
        )
        .select(
            "user_id",
            "event_id",
            "value",
            "n_win",
            F.expr(
                "CAST((n_win * v3 - s1) * (n_win * v3 - s1) * (n_win - 1) * 1000"
                " DIV (n_win * (n_win * s2 - s1 * s1)) AS BIGINT)"
            ).alias("z_sq_milli"),
        )
    )


@register(
    "ts_seasonality_profile",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type, hr, n_events,
               CAST(n_events * 1000000 //
                    CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
                    AS BIGINT) AS share_ppm,
               n_events * 24 >
                   CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
                   AS over_uniform
        FROM c
    """,
    doc="Hour-of-day seasonality profile per event type — the diurnal "
    "baseline capacity planning and seasonality-adjusted anomaly "
    "detection both start from: events bucketed by EXTRACT(HOUR), "
    "per-type shares emitted in integer ppm (count*1e6 DIV type total — "
    "exact), plus an over-uniform flag via the cross-multiplied "
    "comparison n*24 > total (no 1/24 float). One partial+final hash agg "
    "collapses any event volume to |types|x24 rows before the window "
    "touches anything — the profile table is constant-sized at 100 TB.",
)
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count("*").alias("n_events"))
    return c.select(
        "event_type",
        "hr",
        "n_events",
        F.expr(
            "CAST(n_events * 1000000 DIV sum(n_events)"
            " OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("share_ppm"),
        F.expr(
            "n_events * 24 > sum(n_events) OVER (PARTITION BY event_type)"
        ).alias("over_uniform"),
    )


CUSUM_H3 = 300_000  # drift alarm threshold in milli-value units


@register(
    "ts_cusum_drift",
    oracle=f"""
        WITH q AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        m AS (
            SELECT user_id,
                   CAST(SUM(v3) AS BIGINT) // COUNT(*) AS mean3
            FROM q GROUP BY 1
        ),
        p AS (
            SELECT q.user_id, q.event_id, q.tss,
                   CAST(SUM(q.v3 - m.mean3) OVER (
                       PARTITION BY q.user_id ORDER BY q.tss, q.event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS pfx
            FROM q JOIN m USING (user_id)
        ),
        c AS (
            SELECT user_id, event_id,
                   pfx - CAST(MIN(pfx) OVER (
                       PARTITION BY user_id ORDER BY tss, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cusum3
            FROM p
        )
        SELECT user_id, event_id, cusum3
        FROM c WHERE cusum3 >= {CUSUM_H3}
    """,
    doc=f"CUSUM positive-drift detection (Page's cumulative-sum control "
    f"chart — the change-point alarm for metric drift and sensor bias): "
    f"the textbook recurrence S_t = max(0, S_(t-1) + (x_t - target)) is "
    f"sequential, but it has a CLOSED FORM — S_t = P_t - min_(j<=t) P_j "
    f"with P the running sum of deviations — so the whole detector is "
    f"two stacked prefix windows (cumsum, then running min) over one "
    f"user_id partitioning, fully distributed. Per-user targets are the "
    f"integer floor-mean of the milli-quantized values (one agg, joined "
    f"back); every step is BIGINT arithmetic, so output is hash-exact "
    f"across engines. Rows where S_t >= {CUSUM_H3} (drift episodes) are "
    f"emitted. At 100 TB: one shuffle on user_id shared by both windows "
    f"and the join; nothing is data-sized except the stream itself.",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    q = e.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    m = q.groupBy("user_id").agg(
        F.expr("CAST(SUM(v3) AS BIGINT) DIV COUNT(*)").alias("mean3")
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = q.join(m, "user_id").select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("v3") - F.col("mean3")).over(wc).alias("pfx"),
    )
    c = p.select(
        "user_id",
        "event_id",
        (F.col("pfx") - F.min("pfx").over(wc)).alias("cusum3"),
    )
    return c.where(F.col("cusum3") >= CUSUM_H3)


@register(
    "ts_mad_outliers",
    oracle="""
        WITH q AS (
            SELECT user_id, event_id,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        med AS (
            SELECT user_id, CAST(QUANTILE_DISC(v3, 0.5) AS BIGINT) AS med3
            FROM q GROUP BY 1
        ),
        d AS (
            SELECT q.user_id, q.event_id, med.med3,
                   ABS(q.v3 - med.med3) AS dev3
            FROM q JOIN med USING (user_id)
        ),
        mad AS (
            SELECT user_id, CAST(QUANTILE_DISC(dev3, 0.5) AS BIGINT) AS mad3
            FROM d GROUP BY 1
        )
        SELECT d.user_id, d.event_id, d.med3, d.dev3, mad.mad3
        FROM d JOIN mad USING (user_id)
        WHERE mad.mad3 > 0 AND d.dev3 > 3 * mad.mad3
    """,
    doc="Robust outlier detection via median absolute deviation — the "
    "heavy-tail-safe complement to ts_zscore_anomaly (mean/stddev are "
    "themselves dragged by the outliers they should flag; median/MAD "
    "have a 50% breakdown point): per-user discrete median of the "
    "milli-quantized values (percentile_disc ≡ QUANTILE_DISC lower "
    "convention, the agg_approx_percentile_bounds discipline), absolute "
    "deviations, their discrete median (the MAD), and the integer "
    "comparison dev > 3*MAD — every step BIGINT, hash-exact. Plan: two "
    "percentile aggregations and two joins, ALL partitioned on user_id — "
    "one logical shuffle key end to end; exact discrete medians at "
    "100 TB come from the same single-key repartition (or the sketch "
    "variant when rank error is acceptable — see "
    "agg_approx_percentile_bounds).",
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    q = e.select(
        "user_id", "event_id", F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3")
    )
    med = q.groupBy("user_id").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v3) AS BIGINT)").alias(
            "med3"
        )
    )
    d = q.join(med, "user_id").select(
        "user_id", "event_id", "med3", F.abs(F.col("v3") - F.col("med3")).alias("dev3")
    )
    mad = d.groupBy("user_id").agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev3) AS BIGINT)"
        ).alias("mad3")
    )
    return (
        d.join(mad, "user_id")
        .where((F.col("mad3") > 0) & (F.col("dev3") > 3 * F.col("mad3")))
        .select("user_id", "event_id", "med3", "dev3", "mad3")
    )


@register(
    "ts_session_stats",
    oracle="""
        WITH marked AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss,
                   CASE WHEN EPOCH_US(CAST(ts AS TIMESTAMP))
                             - LAG(EPOCH_US(CAST(ts AS TIMESTAMP))) OVER (
                                   PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
                             > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ),
        sess AS (
            SELECT user_id, event_id, tss,
                   CAST(SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY tss, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM marked
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               CAST(EPOCH_US(MAX(tss)) - EPOCH_US(MIN(tss)) AS BIGINT)
                   AS duration_us,
               CAST(MIN(event_id) AS BIGINT) AS first_event
        FROM sess
        GROUP BY user_id, session_id
    """,
    doc="Session-level statistics (the session table engagement "
    "dashboards, bounce-rate metrics, and duration histograms read): "
    "30-minute-gap sessionization (the win_sessionize / "
    "funnel_sessionized construct — this family shares ONE session "
    "definition across three grains: per-event labels, per-session "
    "stats, corpus funnel) aggregated to one row per (user, session): "
    "event count, exact integer duration in epoch microseconds, and "
    "the anchoring first event. One user_id shuffle serves the lag "
    "window, the running sum, and the session aggregate; output is "
    "session-count sized. All integer/copied values — hash-exact.",
)
def ts_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    marked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(us - F.lag(us).over(wl) > 1_800_000_000, 1).otherwise(0).alias(
            "new_sess"
        ),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("new_sess").over(wc).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.expr(
            "CAST(unix_micros(CAST(MAX(ts) AS TIMESTAMP))"
            " - unix_micros(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT)"
        ).alias("duration_us"),
        F.min("event_id").alias("first_event"),
    )


@register(
    "ts_rolling_extrema",
    oracle="""
        WITH q AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        )
        SELECT user_id, event_id, v3,
               CAST(MIN(v3) OVER w AS BIGINT) AS lo24,
               CAST(MAX(v3) OVER w AS BIGINT) AS hi24,
               v3 >= MAX(v3) OVER w AS is_breakout_high,
               v3 <= MIN(v3) OVER w AS is_breakout_low
        FROM q
        WINDOW w AS (
            PARTITION BY user_id ORDER BY tss, event_id
            ROWS BETWEEN 23 PRECEDING AND CURRENT ROW
        )
    """,
    doc="Rolling extrema channel (the Donchian/breakout shape: trailing "
    "24-observation min/max per user, with breakout flags when the "
    "current value touches the channel edge). Extremes complement the "
    "variance (z-score) and median (MAD) detectors: a slow drift never "
    "trips a breakout, a single spike always does. Values are milli-"
    "quantized BIGINTs, min/max are exact order statistics — no "
    "arithmetic at all, hash-exact by construction. One user_id "
    "shuffle; rolling min/max over a ROWS frame is a monotonic-deque "
    "pass, O(1) amortized per row at any scale.",
)
def ts_rolling_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, Window.currentRow)
    )
    q = e.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    return q.select(
        "user_id",
        "event_id",
        "v3",
        F.min("v3").over(wf).alias("lo24"),
        F.max("v3").over(wf).alias("hi24"),
        (F.col("v3") >= F.max("v3").over(wf)).alias("is_breakout_high"),
        (F.col("v3") <= F.min("v3").over(wf)).alias("is_breakout_low"),
    )


@register(
    "ts_rolling_robust",
    oracle="""
        WITH q AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        )
        SELECT user_id, event_id, v3,
               MEDIAN(v3) OVER w AS med24,
               QUANTILE_CONT(v3, 0.25) OVER w AS q1_24,
               QUANTILE_CONT(v3, 0.75) OVER w AS q3_24,
               QUANTILE_CONT(v3, 0.75) OVER w
                   - QUANTILE_CONT(v3, 0.25) OVER w AS iqr24,
               v3 > QUANTILE_CONT(v3, 0.75) OVER w
                   + 1.5 * (QUANTILE_CONT(v3, 0.75) OVER w
                            - QUANTILE_CONT(v3, 0.25) OVER w)
                   AS is_outlier_high,
               v3 < QUANTILE_CONT(v3, 0.25) OVER w
                   - 1.5 * (QUANTILE_CONT(v3, 0.75) OVER w
                            - QUANTILE_CONT(v3, 0.25) OVER w)
                   AS is_outlier_low
        FROM q
        WINDOW w AS (
            PARTITION BY user_id ORDER BY tss, event_id
            ROWS BETWEEN 23 PRECEDING AND CURRENT ROW
        )
    """,
    doc="Rolling robust statistics (trailing 24-observation median and "
    "interquartile range per user, with Tukey-fence outlier flags at "
    "1.5x IQR). The robust complement of ts_rolling_extrema (order-"
    "statistic channel) and ts_zscore_anomaly (moment-based): the IQR "
    "fence ignores up to 25% contamination in the window, where mean/"
    "stddev are dragged by every spike. Spark's percentile() is a true "
    "window-frame function (median() is not — it rejects frames), and "
    "its linear interpolation index p*(n-1) matches DuckDB's "
    "QUANTILE_CONT exactly; on milli-quantized BIGINTs with quarter "
    "fractions every interpolated value is an exact dyadic double, so "
    "the result is hash-portable with NO rounding. One user_id shuffle; "
    "the frame sort is per-partition. Rolling percentile has no "
    "invertible update, so Spark recomputes per frame — O(frame log "
    "frame) per row with frame=24 fixed, still linear in rows at any "
    "corpus size.",
)
def ts_rolling_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, Window.currentRow)
    )
    q = e.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    med = F.percentile("v3", F.lit(0.5)).over(wf)
    q1 = F.percentile("v3", F.lit(0.25)).over(wf)
    q3 = F.percentile("v3", F.lit(0.75)).over(wf)
    return q.select(
        "user_id",
        "event_id",
        "v3",
        med.alias("med24"),
        q1.alias("q1_24"),
        q3.alias("q3_24"),
        (q3 - q1).alias("iqr24"),
        (F.col("v3") > q3 + 1.5 * (q3 - q1)).alias("is_outlier_high"),
        (F.col("v3") < q1 - 1.5 * (q3 - q1)).alias("is_outlier_low"),
    )


@register(
    "ts_interval_merge",
    oracle="""
        WITH iv AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS s,
                   CAST(ts AS TIMESTAMP)
                     + (30 + event_id % 90) * INTERVAL 1 MINUTE AS e
            FROM events
        ),
        m AS (
            SELECT user_id, s, e,
                   MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_max
            FROM iv
        ),
        g AS (
            SELECT user_id, s, e,
                   SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS island
            FROM m
        )
        SELECT user_id, CAST(island AS BIGINT) AS island_id,
               MIN(s) AS start_ts, MAX(e) AS end_ts,
               COUNT(*) AS n_intervals
        FROM g GROUP BY user_id, island
    """,
    doc="Overlapping-interval merge (gaps-and-islands): each event opens "
    "an activity interval [ts, ts + (30 + event_id % 90) min] and "
    "per-user overlapping/touching intervals coalesce into maximal "
    "islands — the canonical form of session coverage, on-call overlap, "
    "and machine-uptime consolidation, and a DIFFERENT idiom from "
    "win_sessionize (fixed inactivity gap between POINTS; here spans "
    "with heterogeneous lengths merge on actual overlap). Island "
    "boundary = start strictly past the running MAX(end) over all prior "
    "intervals (max-so-far, not lag(e) — lag alone breaks on nested "
    "intervals); the island id is a running sum of boundary flags. Both "
    "windows and the final agg share ONE hash partitioning on user_id; "
    "per-key window state is O(1) (running max + running sum). "
    "Deterministic under (s, e) sort-ties because tied rows are "
    "interchangeable for both max and boundary-sum. Timestamp + BIGINT "
    "output → hash-exact; interval arithmetic is integer minutes on "
    "both engines.",
)
def ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        F.expr("ts + make_dt_interval(0, 0, 30 + event_id % 90, 0)").alias(
            "e"
        ),
    )
    by_time = Window.partitionBy("user_id").orderBy("s", "e")
    m = iv.withColumn(
        "prev_max",
        F.max("e").over(by_time.rowsBetween(Window.unboundedPreceding, -1)),
    )
    g = m.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")),
                1,
            ).otherwise(0)
        ).over(by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return g.groupBy(
        "user_id", F.col("island").cast("long").alias("island_id")
    ).agg(
        F.min("s").alias("start_ts"),
        F.max("e").alias("end_ts"),
        F.count("*").alias("n_intervals"),
    )


@register(
    "ts_acf",
    oracle="""
        WITH b AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS hr,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                     AS v3
            FROM events GROUP BY 1, 2
        ),
        l AS (
            SELECT user_id, hr, v3,
                   LEAD(v3) OVER (PARTITION BY user_id ORDER BY hr)
                     AS v3_next,
                   LEAD(hr) OVER (PARTITION BY user_id ORDER BY hr)
                     AS hr_next
            FROM b
        ),
        stats AS (
            SELECT user_id, COUNT(*) AS n, CAST(SUM(v3) AS BIGINT) AS s
            FROM b GROUP BY user_id
        ),
        dev AS (
            SELECT l.user_id,
                   CAST(SUM(CAST(st.n * l.v3 - st.s AS DECIMAL(18,0))
                            * CAST(st.n * l.v3_next - st.s
                                   AS DECIMAL(18,0))) AS BIGINT) AS num,
                   COUNT(*) AS n_pairs
            FROM l JOIN stats st ON st.user_id = l.user_id
            WHERE l.v3_next IS NOT NULL
              AND l.hr_next = l.hr + INTERVAL 1 HOUR
            GROUP BY l.user_id
        ),
        den AS (
            SELECT b.user_id,
                   CAST(SUM(CAST(st.n * b.v3 - st.s AS DECIMAL(18,0))
                            * CAST(st.n * b.v3 - st.s AS DECIMAL(18,0)))
                        AS BIGINT) AS den
            FROM b JOIN stats st ON st.user_id = b.user_id
            GROUP BY b.user_id
        )
        SELECT d.user_id, d.n_pairs, d.num, e.den,
               CASE WHEN e.den = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(d.num AS DOUBLE) / CAST(e.den AS DOUBLE)
               END AS acf1
        FROM dev d JOIN den e ON e.user_id = d.user_id
    """,
    doc="Exact lag-1 autocorrelation per user over hourly buckets — the "
    "seasonality/persistence diagnostic behind forecastability scoring "
    "(is this series momentum-driven or white noise?). Mean-centering "
    "is done EXACTLY in integers by scaling through n (n*x - S is n "
    "times the deviation; the n^2 factors cancel in the ratio), so "
    "num/den are integer-exact and engine-identical; the single final "
    "ratio is one correctly-rounded IEEE division. Deviation products "
    "accumulate through DECIMAL(18)x(18) -> DECIMAL(37) so no partial "
    "sum can wrap BIGINT before the final cast (bound: |n*v3 - s| < "
    "1e18 requires n * |v3|_max < 1e18 — calendar-bounded buckets keep "
    "n small regardless of raw event volume). Adjacent-hour pairs only "
    "(LEAD + hr gap check): gaps do not fabricate correlations. One "
    "hash partitioning on user_id serves bucketing, the LEAD window, "
    "and both reductions; the stats join is a post-aggregate "
    "key-to-key equi join.",
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    b = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v3")
    )
    by_hr = Window.partitionBy("user_id").orderBy("hr")
    l = b.select(
        "user_id",
        "hr",
        "v3",
        F.lead("v3").over(by_hr).alias("v3_next"),
        F.lead("hr").over(by_hr).alias("hr_next"),
    )
    stats = b.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("v3").cast("long").alias("s")
    )
    dev_a = F.expr("CAST(n * v3 - s AS DECIMAL(18,0))")
    dev_b = F.expr("CAST(n * v3_next - s AS DECIMAL(18,0))")
    dev = (
        l.join(stats, "user_id")
        .where(
            F.col("v3_next").isNotNull()
            & (F.col("hr_next") == F.col("hr") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(
            F.sum(dev_a * dev_b).cast("long").alias("num"),
            F.count("*").alias("n_pairs"),
        )
    )
    den = (
        b.join(stats, "user_id")
        .groupBy("user_id")
        .agg(F.sum(dev_a * dev_a).cast("long").alias("den"))
    )
    return dev.join(den, "user_id").select(
        "user_id",
        "n_pairs",
        "num",
        "den",
        F.when(F.col("den") == 0, F.lit(0.0))
        .otherwise(F.col("num").cast("double") / F.col("den").cast("double"))
        .alias("acf1"),
    )


@register(
    "ts_period_over_period",
    oracle="""
        WITH m AS (
            SELECT c.c_nationkey AS nationkey,
                   CAST(DATE_TRUNC('month', o.o_orderdate) AS TIMESTAMP)
                     AS month_ts,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        ),
        l AS (
            SELECT nationkey, month_ts, rev_cents,
                   LAG(rev_cents) OVER (PARTITION BY nationkey
                                        ORDER BY month_ts) AS prev_rev,
                   LAG(month_ts) OVER (PARTITION BY nationkey
                                       ORDER BY month_ts) AS prev_month
            FROM m
        )
        SELECT nationkey, month_ts, rev_cents,
               CASE WHEN prev_month = month_ts - INTERVAL 1 MONTH
                    THEN rev_cents - prev_rev END AS mom_delta_cents,
               CASE WHEN prev_month = month_ts - INTERVAL 1 MONTH
                         AND prev_rev <> 0
                    THEN (rev_cents - prev_rev) * 10000 // prev_rev
               END AS mom_delta_bps
        FROM l
    """,
    doc="Period-over-period reporting (month-over-month revenue per "
    "nation): monthly pre-aggregation, then LAG within the nation "
    "partition with an adjacency guard — a missing month yields NULL "
    "deltas rather than comparing against the wrong period (the "
    "correctness detail naive LAG reports get wrong). Delta in exact "
    "integer cents; relative change in integer basis points "
    "(x*10000 DIV prev — both engines truncate toward zero). One "
    "shuffle on the custkey join, one on the (nation, month) agg; the "
    "LAG window input is the post-aggregate month table "
    "(calendar-bounded per nation, never event-scale).",
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    m = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.date_trunc("month", "o_orderdate").alias("month_ts"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    w = Window.partitionBy("nationkey").orderBy("month_ts")
    l = m.select(
        "nationkey",
        "month_ts",
        "rev_cents",
        F.lag("rev_cents").over(w).alias("prev_rev"),
        F.lag("month_ts").over(w).alias("prev_month"),
    )
    adjacent = F.col("prev_month") == F.col("month_ts") - F.expr(
        "INTERVAL 1 MONTH"
    )
    return l.select(
        "nationkey",
        "month_ts",
        "rev_cents",
        F.when(adjacent, F.col("rev_cents") - F.col("prev_rev")).alias(
            "mom_delta_cents"
        ),
        F.when(
            adjacent & (F.col("prev_rev") != 0),
            F.expr("(rev_cents - prev_rev) * 10000 DIV prev_rev"),
        ).alias("mom_delta_bps"),
    )


@register(
    "gen_calendar_dim",
    oracle="""
        WITH bounds AS (
            SELECT CAST(DATE_TRUNC('day', MIN(o_orderdate)) AS TIMESTAMP)
                     AS d0,
                   CAST(DATE_TRUNC('day', MAX(o_orderdate)) AS TIMESTAMP)
                     AS d1
            FROM orders
        ),
        spine AS (
            SELECT UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS cal_ts
            FROM bounds
        )
        SELECT cal_ts,
               CAST(EXTRACT(YEAR FROM cal_ts) AS BIGINT) AS year,
               CAST(EXTRACT(QUARTER FROM cal_ts) AS BIGINT) AS quarter,
               CAST(EXTRACT(MONTH FROM cal_ts) AS BIGINT) AS month,
               CAST(EXTRACT(DAY FROM cal_ts) AS BIGINT) AS day,
               CAST(EXTRACT(ISODOW FROM cal_ts) AS BIGINT) AS isodow,
               EXTRACT(ISODOW FROM cal_ts) >= 6 AS is_weekend,
               CAST(cal_ts AS DATE) = LAST_DAY(CAST(cal_ts AS DATE))
                 AS is_month_end
        FROM spine
    """,
    doc="Calendar dimension generation — the date spine every star "
    "schema joins against, derived from the fact table's own min/max "
    "day (one aggregate) and exploded via sequence: year/quarter/"
    "month/day, ISO day-of-week (Spark's weekday()+1 == DuckDB's "
    "ISODOW — the raw dayofweek() functions DISAGREE on week start, "
    "the classic cross-engine calendar bug), weekend and month-end "
    "flags. Emitted as TIMESTAMP, not DATE, because DATE round-trips "
    "through pandas as object-dtype datetime.date on the Spark side "
    "but datetime64 from DuckDB (ORACLE_PARITY.md rule 18's sibling "
    "trap). Calendar-sized output (rows = days spanned) regardless of "
    "fact volume; the spine explode is a narrow map off a 1-row "
    "aggregate.",
)
def gen_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("d0"),
        F.date_trunc("day", F.max("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("cal_ts")
    )
    return spine.select(
        "cal_ts",
        F.year("cal_ts").cast("long").alias("year"),
        F.quarter("cal_ts").cast("long").alias("quarter"),
        F.month("cal_ts").cast("long").alias("month"),
        F.dayofmonth("cal_ts").cast("long").alias("day"),
        (F.weekday("cal_ts") + 1).cast("long").alias("isodow"),
        (F.weekday("cal_ts") + 1 >= 6).alias("is_weekend"),
        (
            F.to_date("cal_ts") == F.last_day(F.to_date("cal_ts"))
        ).alias("is_month_end"),
    )


M4_BUCKETS = 64  # target pixel-columns per series


@register(
    "ts_downsample_m4",
    oracle=f"""
        WITH q AS (
            SELECT user_id, event_id,
                   CAST(ts AS TIMESTAMP) AS ts,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        ext AS (
            SELECT user_id,
                   MIN(ts) AS t0, MAX(ts) AS t1, COUNT(*) AS n
            FROM q GROUP BY user_id
        ),
        bucketed AS (
            SELECT q.user_id, q.event_id, q.ts, q.v3,
                   CAST(LEAST({M4_BUCKETS - 1},
                        {M4_BUCKETS} * DATE_DIFF('microseconds', e.t0, q.ts)
                        // GREATEST(1, DATE_DIFF('microseconds', e.t0, e.t1) + 1)
                   ) AS BIGINT) AS bucket
            FROM q JOIN ext e ON e.user_id = q.user_id
        )
        SELECT user_id, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               MIN(ts) AS t_first, MAX(ts) AS t_last,
               MIN(v3) AS v_min, MAX(v3) AS v_max
        FROM bucketed
        GROUP BY user_id, bucket
    """,
    doc=f"M4 visualization-oriented downsampling (Jugel et al., VLDB "
    f"2014): per series (user), split the time span into "
    f"{M4_BUCKETS} equal pixel-column buckets and keep each bucket's "
    f"min/max value and first/last timestamp — the four points that "
    f"make a line chart of the reduced series PIXEL-IDENTICAL to the "
    f"full one at that width. Chosen over LTTB (the other standard "
    f"downsampler) deliberately: LTTB's selected point depends on the "
    f"previously selected point — inherently sequential — while M4 is "
    f"a pure per-bucket aggregate: one shuffle on (user, bucket), "
    f"map-side combinable, embarrassingly parallel at 100 TB. Bucket "
    f"index is exact integer microsecond arithmetic against each "
    f"key's own span (broadcast |users| extents), clamped so the "
    f"max-timestamp row lands in the last bucket.",
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    q = e.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    ext = q.groupBy("user_id").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    b = q.join(F.broadcast(ext), "user_id").select(
        "user_id",
        "event_id",
        "ts",
        "v3",
        F.least(
            F.lit(M4_BUCKETS - 1),
            F.expr(
                f"{M4_BUCKETS} * (unix_micros(ts) - unix_micros(t0))"
                f" DIV GREATEST(1, unix_micros(t1) - unix_micros(t0) + 1)"
            ),
        )
        .cast("long")
        .alias("bucket"),
    )
    return b.groupBy("user_id", "bucket").agg(
        F.count("*").cast("long").alias("n_points"),
        F.min("ts").alias("t_first"),
        F.max("ts").alias("t_last"),
        F.min("v3").alias("v_min"),
        F.max("v3").alias("v_max"),
    )


LAG_RANGE = 3  # cross-correlation lags: -3 .. +3 days


@register(
    "ts_lead_lag_corr",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
                   CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS a,
                   CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS b
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT l.lag, da.a, db.b
            FROM (SELECT UNNEST(RANGE(-{LAG_RANGE}, {LAG_RANGE + 1})) AS lag) l
            JOIN daily da ON TRUE
            JOIN daily db ON db.d = da.d + CAST(l.lag AS INT)
        ),
        moments AS (
            SELECT lag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(a AS HUGEINT)) AS sa,
                   SUM(CAST(b AS HUGEINT)) AS sb,
                   SUM(CAST(a AS HUGEINT) * a) AS saa,
                   SUM(CAST(b AS HUGEINT) * b) AS sbb,
                   SUM(CAST(a AS HUGEINT) * b) AS sab
            FROM lagged GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n,
               ROUND(CAST(n * sab - sa * sb AS DOUBLE)
                     / SQRT(CAST(n * saa - sa * sa AS DOUBLE))
                     / SQRT(CAST(n * sbb - sb * sb AS DOUBLE)), 9)
                   AS xcorr
        FROM moments
    """,
    doc=f"Lead-lag cross-correlation between the daily view series and "
    f"the daily purchase series at lags -{LAG_RANGE}..+{LAG_RANGE} — "
    f"the 'does activity today predict conversions in k days' "
    f"diagnostic behind attribution windows and campaign timing. One "
    f"data-scale aggregate (events -> |days| x 2 counters); the lag "
    f"self-join and Pearson moments run on the bounded calendar table "
    f"(|days| x 7 rows). Moments are exact HUGEINT/DECIMAL "
    f"cross-products; each correlation is two float square roots and "
    f"a division in fixed expression order — hash-stable to ROUND 9.",
)
def ts_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("d")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("a"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).cast("long").alias("b"),
    )
    lags = spark.range(-LAG_RANGE, LAG_RANGE + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    da = daily.select(F.col("d").alias("da_d"), F.col("a"))
    db = daily.select(F.col("d").alias("db_d"), F.col("b"))
    lagged = (
        lags.crossJoin(da)  # bounded: 7 lags x |days|
        .join(db, F.expr("db_d = date_add(da_d, lag)"))
        .select("lag", "a", "b")
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    moments = lagged.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr(dec.format("a"))).alias("sa"),
        F.sum(F.expr(dec.format("b"))).alias("sb"),
        F.sum(F.expr(dec.format("a") + " * a")).alias("saa"),
        F.sum(F.expr(dec.format("b") + " * b")).alias("sbb"),
        F.sum(F.expr(dec.format("a") + " * b")).alias("sab"),
    )
    return moments.select(
        F.col("lag").cast("long").alias("lag"),
        "n",
        F.round(
            F.expr(
                "CAST(n * sab - sa * sb AS DOUBLE)"
                " / SQRT(CAST(n * saa - sa * sa AS DOUBLE))"
                " / SQRT(CAST(n * sbb - sb * sb AS DOUBLE))"
            ),
            9,
        ).alias("xcorr"),
    )


@register(
    "ts_step_changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, d, c,
                   CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY d)
                        AS BIGINT) AS cum_c,
                   CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                        AS BIGINT) AS k,
                   CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n_days
            FROM daily
        ),
        splits AS (
            SELECT event_type, d AS split_day, k, n_days, cum_c, tot,
                   ABS(cum_c * (n_days - k) - (tot - cum_c) * k) AS diff_num
            FROM cum WHERE k < n_days
        ),
        best AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY diff_num DESC, split_day) AS rk
            FROM splits
        )
        SELECT event_type, CAST(split_day AS TIMESTAMP) AS split_day,
               diff_num,
               CAST(cum_c AS DOUBLE) / k AS mean_before,
               CAST(tot - cum_c AS DOUBLE) / (n_days - k) AS mean_after
        FROM best WHERE rk = 1
    """,
    doc="Single step-changepoint detection per event type — the "
    "largest mean-shift split of the daily-count series (binary-"
    "segmentation's first step; monitoring teams read this as 'when "
    "did the level change'): every day k is a candidate split, scored "
    "by the cross-multiplied EXACT integer |cum_k*(n-k) - "
    "(tot-cum_k)*k| (= k*(n-k)*|mean_before - mean_after| — "
    "monotone-equivalent scoring with zero float comparisons; note "
    "the k(n-k) weighting is also the correct variance weighting for "
    "a mean-shift scan), argmax with a deterministic day tiebreak, "
    "and the two means emitted as single exact-integer divisions. "
    "Everything after the daily rollup runs on the bounded "
    "|types| x |days| grid. At 100 TB only the rollup touches data.",
)
def ts_step_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("d"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    wt = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "d",
        F.sum("c").over(wt.orderBy("d")).cast("long").alias("cum_c"),
        F.row_number().over(wt.orderBy("d")).cast("long").alias("k"),
        F.sum("c").over(wt).cast("long").alias("tot"),
        F.count("*").over(wt).cast("long").alias("n_days"),
    )
    splits = cum.where(F.col("k") < F.col("n_days")).select(
        "event_type",
        F.col("d").alias("split_day"),
        "k",
        "n_days",
        "cum_c",
        "tot",
        F.abs(
            F.col("cum_c") * (F.col("n_days") - F.col("k"))
            - (F.col("tot") - F.col("cum_c")) * F.col("k")
        ).alias("diff_num"),
    )
    best = splits.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("diff_num"), "split_day")
        ),
    ).where(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.col("split_day").cast("timestamp").alias("split_day"),
        "diff_num",
        (F.col("cum_c").cast("double") / F.col("k")).alias("mean_before"),
        (
            (F.col("tot") - F.col("cum_c")).cast("double")
            / (F.col("n_days") - F.col("k"))
        ).alias("mean_after"),
    )


@register(
    "ts_theilsen_slope",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(DATE_DIFF('day', DATE '2024-01-01',
                        CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE))
                        AS BIGINT) AS di,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.event_type,
                   CAST(b.c - a.c AS DOUBLE) / (b.di - a.di) AS slope,
                   a.di AS i, b.di AS j
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND b.di > a.di
        ),
        ranked AS (
            SELECT event_type, slope,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY slope, i, j) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS m
            FROM slopes
        )
        SELECT event_type,
               CAST(MAX(m) AS BIGINT) AS n_pairs,
               (MIN(CASE WHEN rn = (m + 1) // 2 THEN slope END)
                + MIN(CASE WHEN rn = (m + 2) // 2 THEN slope END)) / 2
                   AS median_slope
        FROM ranked
        GROUP BY event_type
    """,
    doc="Theil-Sen trend estimate per event type — the robust slope "
    "(median of all pairwise day slopes) that one outage day cannot "
    "drag the way OLS can (breakdown point 29% vs 0%): every day "
    "pair's slope is ONE exact-integer division (identical IEEE "
    "result both engines), the median is an exact order statistic "
    "with even-count averaging, and the deterministic (slope, i, j) "
    "tiebreak pins ranks under ties. The pairwise join is "
    "deliberately CALENDAR-bounded — |days|^2 per type (~30k pairs "
    "per year-type), constant in row count, so the op costs the "
    "same at 100 TB as at 100 MB once the daily rollup lands.",
)
def ts_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date"),
                F.lit("2024-01-01").cast("date"),
            )
            .cast("long")
            .alias("di"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    a = daily.select(
        "event_type", F.col("di").alias("i"), F.col("c").alias("ca")
    )
    b = daily.select(
        F.col("event_type").alias("et2"), F.col("di").alias("j"), F.col("c").alias("cb")
    )
    slopes = (
        a.join(b, (F.col("event_type") == F.col("et2")) & (F.col("j") > F.col("i")))
        .select(
            "event_type",
            ((F.col("cb") - F.col("ca")).cast("double") / (F.col("j") - F.col("i"))).alias(
                "slope"
            ),
            "i",
            "j",
        )
    )
    wp = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wp.orderBy("slope", "i", "j")).alias("rn"),
        F.count("*").over(wp).alias("m"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("m").cast("long").alias("n_pairs"),
        (
            (
                F.min(F.when(F.col("rn") == F.expr("(m + 1) DIV 2"), F.col("slope")))
                + F.min(F.when(F.col("rn") == F.expr("(m + 2) DIV 2"), F.col("slope")))
            )
            / 2
        ).alias("median_slope"),
    )


@register(
    "ts_kendall_tau",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                   SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS v3
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CASE WHEN (a.v3 - b.v3) > 0 THEN 1 ELSE 0 END AS conc,
                   CASE WHEN (a.v3 - b.v3) < 0 THEN 1 ELSE 0 END AS disc,
                   CASE WHEN a.v3 = b.v3 THEN 1 ELSE 0 END AS tie_y
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d > b.d
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n0,
                   CAST(SUM(conc) AS BIGINT) AS n_conc,
                   CAST(SUM(disc) AS BIGINT) AS n_disc,
                   CAST(SUM(tie_y) AS BIGINT) AS n_tie
            FROM pairs GROUP BY event_type
        )
        SELECT event_type, n0, n_conc, n_disc, n_tie,
               ROUND(CAST(n_conc - n_disc AS DOUBLE)
                     / SQRT(CAST(n0 AS DOUBLE) * (n0 - n_tie)), 9)
                 AS kendall_tau_b
        FROM s
        ORDER BY event_type
    """,
    doc="Kendall's tau-b rank correlation of the per-type daily series "
    "against time — the robust monotone-trend test that pairs with "
    "ts_theilsen_slope (Theil-Sen estimates the slope, tau tests its "
    "existence; together they are the Mann-Kendall trend suite): over "
    "the daily aggregate (exact milli-summed BIGINT, so comparisons "
    "are integer-exact and ties are real ties), every day pair within "
    "an event_type is classified concordant / discordant / value-tied, "
    "and tau_b = (C-D)/sqrt(n0*(n0-n_ties_y)) — day keys are distinct "
    "so the x-tie term vanishes; ONE float sqrt+division per type at "
    "the end. The pair self-join is per-key over the CALENDAR-bounded "
    "daily table (the ts_theilsen_slope discipline: 365 days -> 66k "
    "pairs per key regardless of raw row count), so the O(d^2) explode "
    "is a fixed dimension cost while the raw scan stays one hash agg "
    "at 100 TB.",
)
def ts_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.col("ts").cast("timestamp").cast("date").alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("v3")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") > F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.v3") > F.col("b.v3")).cast("int").alias("conc"),
        (F.col("a.v3") < F.col("b.v3")).cast("int").alias("disc"),
        (F.col("a.v3") == F.col("b.v3")).cast("int").alias("tie_y"),
    )
    s = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n0"),
        F.sum("conc").cast("long").alias("n_conc"),
        F.sum("disc").cast("long").alias("n_disc"),
        F.sum("tie_y").cast("long").alias("n_tie"),
    )
    return s.select(
        "event_type",
        "n0",
        "n_conc",
        "n_disc",
        "n_tie",
        F.round(
            (F.col("n_conc") - F.col("n_disc")).cast("double")
            / F.sqrt(
                F.col("n0").cast("double") * (F.col("n0") - F.col("n_tie"))
            ),
            9,
        ).alias("kendall_tau_b"),
    ).orderBy("event_type")


#: Periodogram geometry: candidate periods (days) and the micro-quantized
#: cos/sin tables, computed ONCE in Python and injected as identical
#: integer literals into BOTH engines — trig libms differ across
#: engines (Java Math vs DuckDB libm can disagree in the last ulp), so
#: neither engine is allowed to evaluate COS/SIN itself.
PGRAM_PERIODS = tuple(range(2, 11))


def _pgram_coeffs() -> list[tuple[int, int, int, int]]:
    import math

    out = []
    for p in PGRAM_PERIODS:
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            out.append(
                (
                    p,
                    r,
                    int(math.floor(math.cos(ang) * 1_000_000)),
                    int(math.floor(math.sin(ang) * 1_000_000)),
                )
            )
    return out


def _pgram_values_sql() -> str:
    rows = ", ".join(
        f"({p}, {r}, {c}, {s})" for p, r, c, s in _pgram_coeffs()
    )
    return f"(VALUES {rows}) AS coeff(p, r, c6, s6)"


@register(
    "ts_periodogram",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   DATE_DIFF('day',
                             MIN(CAST(ts AS DATE)) OVER (),
                             CAST(ts AS DATE)) AS d,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        terms AS (
            SELECT daily.event_type, coeff.p,
                   SUM(CAST(daily.cnt AS HUGEINT) * coeff.c6) AS sc,
                   SUM(CAST(daily.cnt AS HUGEINT) * coeff.s6) AS ss
            FROM daily JOIN {_pgram_values_sql()}
              ON coeff.r = daily.d % coeff.p
            GROUP BY daily.event_type, coeff.p
        ),
        power AS (
            SELECT event_type, p,
                   CAST((sc * sc + ss * ss) // 1000000000000 AS BIGINT)
                       AS power12,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY (sc * sc + ss * ss) DESC, p
                   ) AS rk
            FROM terms
        )
        SELECT event_type,
               CAST(p AS BIGINT) AS dominant_period_days,
               power12
        FROM power WHERE rk = 1
        ORDER BY event_type
    """,
    doc=f"Discrete-Fourier periodogram over the daily event-count series "
    f"per event type: for each candidate period P in {PGRAM_PERIODS} "
    f"compute the DFT power |sum_d cnt_d * e^(-2pi*i*(d mod P)/P)|^2 "
    f"and report the dominant period — the classical seasonality "
    f"detector (Schuster 1898) that ts_seasonality_profile's fixed "
    f"weekly buckets cannot express. Engine-parity discipline: the "
    f"{sum(PGRAM_PERIODS)} cos/sin coefficients are micro-quantized "
    f"in Python ONCE and injected as identical integer literals into "
    f"both plans (trig libms differ across engines — the "
    f"llm_importance_select LN-table lesson applied to transcendental "
    f"constants), so every product and sum is exact integer algebra "
    f"in DECIMAL(38,0)/HUGEINT (Sc^2 at 100x exceeds BIGINT — the "
    f"agg_chi_square overflow discipline), integer-rescaled by 1e12 "
    f"at the end. Scale: ONE hash aggregate over raw events to the "
    f"calendar-bounded daily grid (days x types rows), then a "
    f"broadcast join against the {len(_pgram_coeffs())}-row "
    f"coefficient table and bounded post-agg windows — the mergeable "
    f"sufficient-statistics shape; at 100 TB the only data-sized "
    f"stage is the first aggregate.",
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "d",
            F.datediff(
                F.col("day"), F.min("day").over(Window.partitionBy())
            ),
        )
    )
    coeff = F.broadcast(
        spark.createDataFrame(_pgram_coeffs(), "p INT, r INT, c6 LONG, s6 LONG")
    )
    # Explode the bounded daily grid by candidate period so the
    # coefficient lookup is an EQUI broadcast hash join on (p, r) — the
    # direct `r = d % p` spelling is a non-equi condition and would plan
    # as a nested-loop join (flagged by the plan audit even when the
    # build side is 54 rows).
    expl = daily.select(
        "event_type",
        "cnt",
        F.explode(F.array(*[F.lit(p) for p in PGRAM_PERIODS])).alias("p"),
        "d",
    ).withColumn("r", F.col("d") % F.col("p"))
    terms = (
        expl.join(coeff, ["p", "r"])
        .groupBy("event_type", "p")
        .agg(
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("c6")).alias("sc"),
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("s6")).alias("ss"),
        )
    )
    power = terms.select(
        "event_type",
        "p",
        F.expr(
            "CAST((sc * sc + ss * ss) DIV CAST(1000000000000 AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("power12"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.expr("sc * sc + ss * ss").desc(), F.col("p")
            )
        )
        .alias("rk"),
    )
    return (
        power.where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("p").cast("long").alias("dominant_period_days"),
            "power12",
        )
        .orderBy("event_type")
    )


#: SAX geometry: PAA segment length in days and the 4-symbol gaussian
#: breakpoints (N(0,1) quartiles), injected as identical literals into
#: both engines.
SAX_SEG_DAYS = 5
SAX_BREAKS = (-0.6745, 0.0, 0.6745)


@register(
    "ts_sax_words",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   DATE_DIFF('day',
                             MIN(CAST(ts AS DATE)) OVER (),
                             CAST(ts AS DATE)) AS d,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(cnt AS HUGEINT)) AS s1,
                   SUM(CAST(cnt AS HUGEINT) * cnt) AS s2
            FROM daily GROUP BY event_type
        ),
        seg AS (
            SELECT event_type, d // {SAX_SEG_DAYS} AS seg,
                   CAST(COUNT(*) AS BIGINT) AS len_s,
                   SUM(CAST(cnt AS HUGEINT)) AS seg_sum
            FROM daily GROUP BY event_type, d // {SAX_SEG_DAYS}
        ),
        z AS (
            SELECT seg.event_type, seg.seg,
                   (CAST(seg.seg_sum AS DOUBLE) / seg.len_s
                    - CAST(stats.s1 AS DOUBLE) / stats.n)
                   / SQRT(CAST(stats.n * stats.s2 - stats.s1 * stats.s1 AS DOUBLE)
                          / (CAST(stats.n AS DOUBLE) * (stats.n - 1))) AS zp
            FROM seg JOIN stats ON stats.event_type = seg.event_type
            WHERE stats.n >= 2 AND stats.n * stats.s2 - stats.s1 * stats.s1 > 0
        )
        SELECT event_type,
               STRING_AGG(
                   CASE WHEN zp < {SAX_BREAKS[0]} THEN 'a'
                        WHEN zp < {SAX_BREAKS[1]} THEN 'b'
                        WHEN zp < {SAX_BREAKS[2]} THEN 'c'
                        ELSE 'd' END, '' ORDER BY seg) AS sax_word,
               CAST(COUNT(*) AS BIGINT) AS n_segments
        FROM z GROUP BY event_type
        ORDER BY event_type
    """,
    doc=f"SAX symbolization (Lin, Keogh, Lonardi & Chiu 2003, 'A Symbolic "
    f"Representation of Time Series'): z-normalize each event type's "
    f"daily-count series, Piecewise-Aggregate-Approximate it into "
    f"{SAX_SEG_DAYS}-day segments, and map each segment mean to one of "
    f"4 symbols at the N(0,1) quartile breakpoints {SAX_BREAKS} — the "
    f"discretization under time-series motif mining, anomaly grammars "
    f"and index-able subsequence search. Parity discipline: PAA means "
    f"are NEVER summed as floats — each segment's z-mean is recovered "
    f"from INTEGER sufficient statistics as (seg_sum/len - mean)/std "
    f"(one fixed-order IEEE chain per row; ts_ewma_kernel's rule 21 "
    f"sidestepped entirely), the breakpoints are shared literals "
    f"(bit-identical via strtod in both engines, D-suffixed on the "
    f"Spark side per rule 24), and degenerate constant series are "
    f"excluded by the INTEGER inequality n*s2 - s1*s1 > 0 (rule 22). "
    f"Scale: one hash aggregate to the calendar-bounded daily grid, "
    f"two bounded aggregates over it — at 100 TB only the first "
    f"aggregate sees data-sized input, and it is map-side combinable.",
)
def ts_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "d",
            F.datediff(F.col("day"), F.min("day").over(Window.partitionBy())),
        )
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("cnt").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("cnt").cast("decimal(19,0)") * F.col("cnt")).cast(
                "decimal(38,0)"
            )
        ).alias("s2"),
    )
    seg = daily.groupBy(
        "event_type", F.expr(f"d DIV {SAX_SEG_DAYS}").alias("seg")
    ).agg(
        F.count("*").cast("long").alias("len_s"),
        F.sum(F.col("cnt").cast("decimal(38,0)")).alias("seg_sum"),
    )
    z = (
        seg.join(stats, "event_type")
        .where(F.expr("n >= 2 AND n * s2 - s1 * s1 > 0"))
        .select(
            "event_type",
            "seg",
            F.expr(
                "(CAST(seg_sum AS DOUBLE) / len_s - CAST(s1 AS DOUBLE) / n)"
                " / SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)"
                "        / (CAST(n AS DOUBLE) * (n - 1)))"
            ).alias("zp"),
        )
    )
    sym = z.select(
        "event_type",
        "seg",
        F.expr(
            f"CASE WHEN zp < {SAX_BREAKS[0]}D THEN 'a'"
            f" WHEN zp < {SAX_BREAKS[1]}D THEN 'b'"
            f" WHEN zp < {SAX_BREAKS[2]}D THEN 'c'"
            f" ELSE 'd' END"
        ).alias("sym"),
    )
    return (
        sym.groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg", "sym"))
                    ),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("sax_word"),
            F.count("*").cast("long").alias("n_segments"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_drawdown",
    oracle="""
        WITH s AS (
            SELECT user_id, event_id, ts,
                   SUM(CAST(FLOOR(value * 1000) AS BIGINT)) OVER w AS cum
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        d AS (
            SELECT user_id, event_id, cum,
                   MAX(cum) OVER w - cum AS dd
            FROM s
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        r AS (
            SELECT user_id, event_id, dd,
                   CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                       AS n_events,
                   CAST(MAX(cum) OVER (PARTITION BY user_id) AS BIGINT)
                       AS peak_milli,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY dd DESC, event_id) AS rk
            FROM d
        )
        SELECT user_id, n_events, peak_milli,
               CAST(dd AS BIGINT) AS max_drawdown_milli,
               event_id AS trough_event_id
        FROM r WHERE rk = 1
        ORDER BY user_id
    """,
    doc="Maximum drawdown per user over the cumulative value series — "
    "the classic peak-to-trough risk measure (finance portfolio "
    "analytics; equally the 'largest budget giveback' question over "
    "any running total): running sum under the event-time order, "
    "running maximum of that sum, drawdown = running-max minus "
    "current, report each user's worst point and the event where it "
    "bottomed (ties to the earliest event id). All integer "
    "milli-arithmetic (rule 22) so the row set is engine-exact; both "
    "running aggregates share ONE time-ordered frame and the final "
    "pick is a rank-1 filter — three windows total, every one "
    "partitioned by user_id (high-cardinality — the scale-safe kind; "
    "per-user sequences are bounded by a user's own activity, the "
    "inherently sequential grain). One hash shuffle on user_id at "
    "any scale; Spark's WindowGroupLimit pushes the rank-1 filter "
    "below the final sort.",
)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    wt = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("v3").over(wt).alias("cum"),
    ).withColumn(
        "dd",
        F.max("cum").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("cum"),
    )
    r = d.select(
        "user_id",
        "event_id",
        "dd",
        F.count("*").over(Window.partitionBy("user_id")).cast("long").alias("n_events"),
        F.max("cum").over(Window.partitionBy("user_id")).cast("long").alias("peak_milli"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.col("dd").desc(), "event_id"))
        .alias("rk"),
    )
    return (
        r.where(F.col("rk") == 1)
        .select(
            "user_id",
            "n_events",
            "peak_milli",
            F.col("dd").cast("long").alias("max_drawdown_milli"),
            F.col("event_id").alias("trough_event_id"),
        )
        .orderBy("user_id")
    )


#: Seasonal-naive lag (weekly) and the backtest holdout length in days.
SNAIVE_LAG = 7
SNAIVE_TEST_DAYS = 7


@register(
    "ts_snaive_backtest",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   DATE_DIFF('day',
                             MIN(CAST(ts AS DATE)) OVER (),
                             CAST(ts AS DATE)) AS d,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        span AS (SELECT MAX(d) AS dmax FROM daily),
        j AS (
            SELECT a.event_type, a.d, a.cnt,
                   b.cnt AS yhat,
                   ABS(a.cnt - b.cnt) AS abs_err
            FROM daily a
            JOIN daily b
              ON b.event_type = a.event_type
             AND b.d = a.d - {SNAIVE_LAG}, span
            WHERE a.d > span.dmax - {SNAIVE_TEST_DAYS}
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_forecasts,
               CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
               CAST(SUM(abs_err) * 1000000 // SUM(cnt) AS BIGINT)
                   AS wmape_micro
        FROM j GROUP BY event_type
        ORDER BY event_type
    """,
    doc=f"Seasonal-naive forecast backtest — the baseline every forecasting "
    f"system must beat (Hyndman & Athanasopoulos, 'Forecasting: "
    f"Principles and Practice': y_hat(t) = y(t - {SNAIVE_LAG})): "
    f"forecast the last {SNAIVE_TEST_DAYS} days of each event type's "
    f"daily count series from the value one season earlier, report MAE "
    f"components and weighted MAPE (sum|err|/sum actual, the "
    f"denominator-safe form) in exact integer micros. This is the "
    f"evaluation harness primitive: any fancier model's backtest "
    f"plugs into the same join-on-lagged-day shape. Scale: one hash "
    f"aggregate to the calendar-bounded daily grid, a self-join on "
    f"(type, d-{SNAIVE_LAG}) over bounded rows, integer aggregation — "
    f"nothing data-sized past the first aggregate. The span scalar "
    f"rides along as a CROSS JOIN of a 1-row aggregate in the ORACLE "
    f"only; the Spark side folds it as a bounded window max.",
)
def ts_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "d",
            F.datediff(F.col("day"), F.min("day").over(Window.partitionBy())),
        )
        .withColumn("dmax", F.max("d").over(Window.partitionBy()))
        .localCheckpoint()
    )
    a = daily.select("event_type", "d", "cnt", "dmax")
    b = daily.select(
        F.col("event_type").alias("bet"),
        F.col("d").alias("bd"),
        F.col("cnt").alias("yhat"),
    )
    j = a.join(
        b,
        (F.col("bet") == F.col("event_type"))
        & (F.col("bd") == F.col("d") - SNAIVE_LAG),
    ).where(F.col("d") > F.col("dmax") - SNAIVE_TEST_DAYS)
    return (
        j.select(
            "event_type",
            "cnt",
            F.abs(F.col("cnt") - F.col("yhat")).alias("abs_err"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_forecasts"),
            F.sum("abs_err").cast("long").alias("sum_abs_err"),
            F.expr(
                "CAST(SUM(abs_err) * 1000000 DIV SUM(cnt) AS BIGINT)"
            ).alias("wmape_micro"),
        )
        .orderBy("event_type")
    )


#: Shewhart individuals-chart constant: UCL/LCL = xbar ± 2.66 * MRbar,
#: spelled as the exact rational 2660/1000 for integer cross-multiplied
#: control tests.
IMR_K_MILLI = 2660


@register(
    "ts_control_chart_imr",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        mr AS (
            SELECT event_type, day, x,
                   ABS(x - LAG(x) OVER (PARTITION BY event_type ORDER BY day))
                       AS mrange
            FROM daily
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(mrange) AS BIGINT) AS smr,
                   CAST(COUNT(mrange) AS BIGINT) AS nmr
            FROM mr GROUP BY event_type
        ),
        flagged AS (
            SELECT mr.event_type, mr.day, mr.x
            FROM mr JOIN s ON s.event_type = mr.event_type
            WHERE ABS(mr.x * s.n_days - s.sx) * s.nmr * 1000
                  > {IMR_K_MILLI} * s.smr * s.n_days
        )
        SELECT s.event_type, s.n_days,
               CAST(s.sx * 1000000 // s.n_days AS BIGINT) AS xbar_micro,
               CAST(s.smr * 1000000 // s.nmr AS BIGINT) AS mrbar_micro,
               CAST(COUNT(flagged.day) AS BIGINT) AS n_out_of_control,
               MIN(flagged.day) AS first_out_day
        FROM s LEFT JOIN flagged ON flagged.event_type = s.event_type
        GROUP BY s.event_type, s.n_days, s.sx, s.smr, s.nmr
        ORDER BY s.event_type
    """,
    doc=f"Shewhart individuals/moving-range (I-MR) control chart over "
    f"daily event counts — the SPC primitive behind 'is today's "
    f"volume within natural process variation': center line = mean, "
    f"control limits = xbar ± 2.66·MRbar (the d2=1.128 individuals "
    f"constant, spelled as the exact rational {IMR_K_MILLI}/1000), a "
    f"day is out of control when it breaches either limit. "
    f"Complements ts_zscore_anomaly (rolling, per-user) and "
    f"ts_cusum_drift (cumulative small shifts) with the classical "
    f"fixed-limit chart auditors expect. The control test is one "
    f"cross-multiplied INTEGER inequality (|x·n − Sx|·n_mr·1000 > "
    f"{IMR_K_MILLI}·SMR·n — rule 22), so the flagged-day set is "
    f"engine-exact; reported center/MRbar are floor-divided micros. "
    f"Scale: one hash aggregate to the calendar grid; the LAG window "
    f"and every join run on bounded day×type rows.",
)
def ts_control_chart_imr(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count("*").cast("long").alias("x"))
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    mr = daily.withColumn(
        "mrange", F.abs(F.col("x") - F.lag("x").over(wlag))
    ).localCheckpoint()
    s = mr.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("mrange").cast("long").alias("smr"),
        F.count("mrange").cast("long").alias("nmr"),
    )
    flagged = (
        mr.join(
            F.broadcast(
                s.select(
                    F.col("event_type").alias("set"),
                    "n_days",
                    "sx",
                    "smr",
                    "nmr",
                )
            ),
            F.col("event_type") == F.col("set"),
        )
        .where(
            F.expr(
                f"ABS(x * n_days - sx) * nmr * 1000"
                f" > {IMR_K_MILLI} * smr * n_days"
            )
        )
        .select(F.col("event_type").alias("fet"), "day")
    )
    return (
        s.join(flagged, s["event_type"] == flagged["fet"], "left")
        .groupBy("event_type", "n_days", "sx", "smr", "nmr")
        .agg(
            F.count("day").cast("long").alias("n_out_of_control"),
            F.min("day").alias("first_out_day"),
        )
        .select(
            "event_type",
            "n_days",
            F.expr("CAST(sx * 1000000 DIV n_days AS BIGINT)").alias(
                "xbar_micro"
            ),
            F.expr("CAST(smr * 1000000 DIV nmr AS BIGINT)").alias(
                "mrbar_micro"
            ),
            "n_out_of_control",
            "first_out_day",
        )
        .orderBy("event_type")
    )


@register(
    "ts_ljung_box",
    oracle="""
        WITH b AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS hr,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                     AS v3
            FROM events GROUP BY 1, 2
        ),
        st AS (
            SELECT user_id, COUNT(*) AS n, CAST(SUM(v3) AS BIGINT) AS s
            FROM b GROUP BY user_id
        ),
        l AS (
            SELECT user_id, v3,
                   LEAD(v3, 1) OVER (PARTITION BY user_id ORDER BY hr)
                     AS w1,
                   LEAD(v3, 2) OVER (PARTITION BY user_id ORDER BY hr)
                     AS w2,
                   LEAD(v3, 3) OVER (PARTITION BY user_id ORDER BY hr)
                     AS w3
            FROM b
        ),
        agg AS (
            SELECT l.user_id,
                   CAST(SUM(CAST(st.n * l.v3 - st.s AS DECIMAL(18,0))
                            * CAST(st.n * l.v3 - st.s AS DECIMAL(18,0)))
                        AS BIGINT) AS den,
                   CAST(SUM(CAST(st.n * l.v3 - st.s AS DECIMAL(18,0))
                            * CAST(st.n * l.w1 - st.s AS DECIMAL(18,0)))
                        AS BIGINT) AS num1,
                   CAST(SUM(CAST(st.n * l.v3 - st.s AS DECIMAL(18,0))
                            * CAST(st.n * l.w2 - st.s AS DECIMAL(18,0)))
                        AS BIGINT) AS num2,
                   CAST(SUM(CAST(st.n * l.v3 - st.s AS DECIMAL(18,0))
                            * CAST(st.n * l.w3 - st.s AS DECIMAL(18,0)))
                        AS BIGINT) AS num3
            FROM l JOIN st ON st.user_id = l.user_id
            GROUP BY l.user_id
        )
        SELECT a.user_id, st.n, a.num1, a.num2, a.num3, a.den,
               CASE WHEN a.den = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE ROUND(CAST(st.n AS DOUBLE) * (st.n + 2)
                         * ((CAST(a.num1 AS DOUBLE) / a.den)
                            * (CAST(a.num1 AS DOUBLE) / a.den) / (st.n - 1)
                          + (CAST(a.num2 AS DOUBLE) / a.den)
                            * (CAST(a.num2 AS DOUBLE) / a.den) / (st.n - 2)
                          + (CAST(a.num3 AS DOUBLE) / a.den)
                            * (CAST(a.num3 AS DOUBLE) / a.den) / (st.n - 3)),
                         9)
               END AS q_lb
        FROM agg a JOIN st ON st.user_id = a.user_id
        WHERE st.n >= 4
        ORDER BY a.user_id
    """,
    doc="Ljung-Box portmanteau Q per user over the hourly-bucket "
    "observation sequence (lags 1-3) — the is-this-white-noise "
    "gate that upgrades ts_acf's single lag-1 diagnostic into the "
    "standard residual-whiteness test (Q ~ chi2(3) under H0). "
    "Autocovariances reuse ts_acf's exact-integer mean-centering "
    "(n*x - S scaling; n^2 cancels in each ratio) with "
    "DECIMAL(18)x(18) deviation products so num/den are "
    "engine-exact BIGINTs; unlike ts_acf, lags are taken over the "
    "ORDERED OBSERVATION SEQUENCE (plain LEAD k, no calendar-"
    "contiguity gate) per the textbook definition on an observed "
    "series. Q itself is the ONE float expression, spelled "
    "identically in both engines (fixed left-to-right IEEE order — "
    "no cross-row float accumulation), ROUND 9. Per-user windows "
    "and both reductions share one user_id hash partitioning; "
    "per-user rows are calendar-bounded, so no skew at 100x.",
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    b = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v3")
    )
    by_hr = Window.partitionBy("user_id").orderBy("hr")
    l = b.select(
        "user_id",
        "v3",
        F.lead("v3", 1).over(by_hr).alias("w1"),
        F.lead("v3", 2).over(by_hr).alias("w2"),
        F.lead("v3", 3).over(by_hr).alias("w3"),
    )
    st = b.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("v3").cast("long").alias("s")
    )
    dev = "CAST(n * v3 - s AS DECIMAL(18,0))"
    agg = (
        l.join(st, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr(f"{dev} * {dev}")).cast("long").alias("den"),
            F.sum(F.expr(f"{dev} * CAST(n * w1 - s AS DECIMAL(18,0))"))
            .cast("long")
            .alias("num1"),
            F.sum(F.expr(f"{dev} * CAST(n * w2 - s AS DECIMAL(18,0))"))
            .cast("long")
            .alias("num2"),
            F.sum(F.expr(f"{dev} * CAST(n * w3 - s AS DECIMAL(18,0))"))
            .cast("long")
            .alias("num3"),
        )
    )
    return (
        agg.join(st.select("user_id", "n"), "user_id")
        .where(F.col("n") >= 4)
        .select(
            "user_id",
            "n",
            "num1",
            "num2",
            "num3",
            "den",
            F.when(F.col("den") == 0, F.lit(0.0))
            .otherwise(
                F.expr(
                    "ROUND(CAST(n AS DOUBLE) * (n + 2)"
                    " * ((CAST(num1 AS DOUBLE) / den)"
                    "    * (CAST(num1 AS DOUBLE) / den) / (n - 1)"
                    "  + (CAST(num2 AS DOUBLE) / den)"
                    "    * (CAST(num2 AS DOUBLE) / den) / (n - 2)"
                    "  + (CAST(num3 AS DOUBLE) / den)"
                    "    * (CAST(num3 AS DOUBLE) / den) / (n - 3)), 9)"
                )
            )
            .alias("q_lb"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_pettitt",
    oracle="""
        WITH b AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS d,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                     AS v3
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT user_id, d, v3,
                   2 * (RANK() OVER (PARTITION BY user_id ORDER BY v3) - 1)
                   + COUNT(*) OVER (PARTITION BY user_id, v3) + 1 AS rank_stat
            FROM b
        ),
        st AS (SELECT user_id, COUNT(*) AS n FROM b GROUP BY user_id),
        u AS (
            SELECT r.user_id, r.d,
                   ROW_NUMBER() OVER (PARTITION BY r.user_id ORDER BY r.d)
                     AS t,
                   SUM(r.rank_stat) OVER (PARTITION BY r.user_id ORDER BY r.d
                       ROWS UNBOUNDED PRECEDING) AS r2cum
            FROM r
        ),
        uu AS (
            SELECT u.user_id, u.d,
                   CAST(ABS(u.r2cum - u.t * (st.n + 1)) AS BIGINT) AS abs_u
            FROM u JOIN st ON st.user_id = u.user_id
            WHERE u.t < st.n
        ),
        k AS (
            SELECT user_id, MAX(abs_u) AS k_stat FROM uu GROUP BY user_id
        ),
        cp AS (
            SELECT uu.user_id, MIN(uu.d) AS cp_day
            FROM uu JOIN k ON k.user_id = uu.user_id AND k.k_stat = uu.abs_u
            GROUP BY uu.user_id
        )
        SELECT k.user_id, CAST(st.n AS BIGINT) AS n_days,
               CAST(k.k_stat AS BIGINT) AS k_stat, cp.cp_day,
               ROUND(2 * EXP(-6 * CAST(k.k_stat AS DOUBLE) * k.k_stat
                     / (CAST(st.n AS DOUBLE) * st.n * st.n
                        + CAST(st.n AS DOUBLE) * st.n)), 9) AS p_approx
        FROM k
        JOIN st ON st.user_id = k.user_id
        JOIN cp ON cp.user_id = k.user_id
        WHERE st.n >= 2
        ORDER BY k.user_id
    """,
    doc="Pettitt's nonparametric changepoint test per user over daily "
    "value sums — the rank-based single-changepoint locator "
    "completing the drift family (ts_cusum_drift assumes a known "
    "target mean; ts_step_changepoint scans level shifts in float; "
    "Pettitt is distribution-free and EXACT here). Uses the identity "
    "U_t = 2*SUM_(i<=t) r_i - t(n+1) (the within-prefix sign terms "
    "cancel by antisymmetry), so with doubled average ranks "
    "(2*below+ties+1 — exact under ties) the whole statistic is "
    "integer: abs_u = |r2cum - t*(n+1)| IS |U_t| exactly (2R_t is the "
    "doubled rank sum and t(n+1) absorbs the doubling; verified "
    "against the brute-force sgn double sum in tests), K = max over "
    "t < n, changepoint = earliest day attaining it. The one float "
    "is the approximate significance 2*exp(-6K^2/(n^3+n^2)) spelled "
    "identically in both engines, ROUND 9. All windows partition by "
    "user_id "
    "(high-cardinality; per-user rows calendar-bounded), ranks and "
    "prefix sums share the same hash partitioning — one shuffle for "
    "the whole plan at 100x.",
)
def ts_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    b = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v3")
    )
    by_v = Window.partitionBy("user_id").orderBy("v3")
    ties = Window.partitionBy("user_id", "v3")
    r = b.select(
        "user_id",
        "d",
        (
            2 * (F.rank().over(by_v) - 1)
            + F.count("*").over(ties)
            + 1
        ).alias("rank_stat"),
    )
    st = b.groupBy("user_id").agg(F.count("*").alias("n"))
    by_d = Window.partitionBy("user_id").orderBy("d")
    cum = by_d.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u = r.select(
        "user_id",
        "d",
        F.row_number().over(by_d).alias("t"),
        F.sum("rank_stat").over(cum).alias("r2cum"),
    )
    uu = (
        u.join(st, "user_id")
        .where(F.col("t") < F.col("n"))
        .select(
            "user_id",
            "d",
            F.abs(F.col("r2cum") - F.col("t") * (F.col("n") + 1))
            .cast("long")
            .alias("abs_u"),
        )
    )
    k = uu.groupBy("user_id").agg(F.max("abs_u").alias("k_stat"))
    cp = (
        uu.join(k, "user_id")
        .where(F.col("abs_u") == F.col("k_stat"))
        .groupBy("user_id")
        .agg(F.min("d").alias("cp_day"))
    )
    return (
        k.join(st, "user_id")
        .join(cp, "user_id")
        .where(F.col("n") >= 2)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_days"),
            F.col("k_stat").cast("long").alias("k_stat"),
            "cp_day",
            F.round(
                2
                * F.exp(
                    -6
                    * F.col("k_stat").cast("double")
                    * F.col("k_stat")
                    / (
                        F.col("n").cast("double") * F.col("n") * F.col("n")
                        + F.col("n").cast("double") * F.col("n")
                    )
                ),
                9,
            ).alias("p_approx"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_isotonic_daily",
    oracle="""
        WITH s AS (
            SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS d,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                     AS v3
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT d, v3,
                   ROW_NUMBER() OVER (ORDER BY d) AS t,
                   SUM(v3) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                     AS ps
            FROM s
        ),
        pairs AS (
            SELECT j.t AS j, k.t AS k,
                   CAST(k.ps - j.ps + j.v3 AS DOUBLE) / (k.t - j.t + 1)
                     AS seg_mean
            FROM idx j JOIN idx k ON j.t <= k.t
        ),
        sufmin AS (
            SELECT j, k,
                   MIN(seg_mean) OVER (PARTITION BY j ORDER BY k DESC
                       ROWS UNBOUNDED PRECEDING) AS min_tail
            FROM pairs
        )
        SELECT idx.d, idx.v3,
               ROUND(MAX(sufmin.min_tail), 9) AS fitted
        FROM sufmin JOIN idx ON idx.t = sufmin.k
        GROUP BY idx.d, idx.v3
        ORDER BY idx.d
    """,
    doc="Isotonic (monotone nondecreasing) regression of the daily "
    "value series via the EXACT minimax identity fitted_i = "
    "max_(j<=i) min_(k>=i) mean(y[j..k]) — the closed form of the "
    "pool-adjacent-violators solution, chosen over PAVA itself "
    "because PAVA is an inherently sequential pooling loop while the "
    "minimax form is pure relational algebra: segment means from "
    "prefix sums (integer-exact numerators), a suffix-min window "
    "per j, and a max-group-by per i. Calibration-curve fitting and "
    "monotone trend extraction are the downstream uses. Floats "
    "appear only as the per-segment division (same spelling both "
    "engines) and min/max over them — no float ACCUMULATION, so no "
    "summation-order hazard; ROUND 9 on the single emitted float. "
    "Cost is the O(n^2) day-pair triangle with an O(n^2) window — "
    "calendar-bounded (n = days, ~365/yr), NOT data-bounded: at any "
    "corpus scale the triangle stays tiny after the one hash agg "
    "over raw events. Validated against a pure-Python PAVA "
    "implementation in tests (the two algorithms agree exactly).",
)
def ts_isotonic_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    s = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v3")
    )
    w_d = Window.orderBy("d")
    idx = s.select(
        "d",
        "v3",
        F.row_number().over(w_d).alias("t"),
        F.sum("v3")
        .over(w_d.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("ps"),
    )
    j = idx.select(
        F.col("t").alias("j"), F.col("ps").alias("ps_j"), F.col("v3").alias("v3_j")
    )
    k = idx.select(F.col("t").alias("k"), F.col("ps").alias("ps_k"))
    pairs = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("ps_k") - F.col("ps_j") + F.col("v3_j")).cast("double")
            / (F.col("k") - F.col("j") + 1)
        ).alias("seg_mean"),
    )
    sufmin = pairs.select(
        "j",
        "k",
        F.min("seg_mean")
        .over(
            Window.partitionBy("j")
            .orderBy(F.col("k").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("min_tail"),
    )
    return (
        sufmin.join(idx, sufmin["k"] == idx["t"])
        .groupBy("d", "v3")
        .agg(F.round(F.max("min_tail"), 9).alias("fitted"))
        .orderBy("d")
    )


PEAK_MIN_MARGIN = 500  # peaks must clear both neighbors by 0.5 (milli)


@register(
    "ts_local_peaks",
    # Peak predicate and margin are exact-integer comparisons on the
    # quantized series (rule 22); ordering is made total with the
    # event_id tiebreak (rule 6). Endpoints (NULL neighbor) are not
    # peaks in either engine (NULL comparison semantics agree).
    oracle=f"""
        WITH q AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        s AS (
            SELECT user_id, event_id, tss, v3,
                   LAG(v3) OVER w AS prev3,
                   LEAD(v3) OVER w AS next3
            FROM q
            WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
        )
        SELECT user_id, event_id, tss AS ts, v3,
               CAST(v3 - GREATEST(prev3, next3) AS BIGINT) AS margin3
        FROM s
        WHERE v3 > prev3 AND v3 > next3
          AND v3 - GREATEST(prev3, next3) >= {PEAK_MIN_MARGIN}
        ORDER BY user_id, event_id
    """,
    doc=f"Local peak detection with a margin gate: a point is a peak "
    f"when it strictly exceeds BOTH temporal neighbors in its "
    f"user's series and clears the taller neighbor by >= "
    f"{PEAK_MIN_MARGIN} milli-units — the spike-mining primitive "
    f"under alert dedup, burst detection, and peak-hour extraction "
    f"(the margin kills the one-tick noise peaks a bare "
    f"greater-than-neighbors rule floods you with). All decisions "
    f"are exact integer comparisons on the floor(value*1000) "
    f"series; series order is total via the event_id tiebreak; "
    f"endpoints are non-peaks by NULL semantics in both engines. "
    f"Plan: one per-user window (lag+lead share a single sort/"
    f"partition pass), predicate in codegen — the per-user "
    f"partitioning carries the data scale; no global window "
    f"anywhere.",
)
def ts_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    q = e.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("tss"),
        F.floor(F.col("value") * 1000).cast("long").alias("v3"),
    )
    w = W.partitionBy("user_id").orderBy("tss", "event_id")
    s = q.select(
        "user_id",
        "event_id",
        "tss",
        "v3",
        F.lag("v3").over(w).alias("prev3"),
        F.lead("v3").over(w).alias("next3"),
    )
    return (
        s.where(
            (F.col("v3") > F.col("prev3"))
            & (F.col("v3") > F.col("next3"))
            & (
                F.col("v3") - F.greatest("prev3", "next3")
                >= PEAK_MIN_MARGIN
            )
        )
        .select(
            "user_id",
            "event_id",
            F.col("tss").alias("ts"),
            "v3",
            (F.col("v3") - F.greatest("prev3", "next3"))
            .cast("long")
            .alias("margin3"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "ts_seasonal_strength",
    # One-way ANOVA R^2 with groups = hour-of-day over the hourly count
    # series (agg_anova_oneway's exact parity discipline): per-group
    # sum-of-squares terms are single IEEE divisions of exact integer
    # sufficient sums, rounded once to 9dp, DECIMAL-summed; the
    # strength is the identical SSB/SST chain on the fold results.
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS h,
                   CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
                       AS hod,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2, 3
        ),
        g AS (
            SELECT event_type, hod,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   SUM(CAST(c AS HUGEINT) * c) AS s2
            FROM hourly GROUP BY 1, 2
        ),
        tot AS (
            -- t2 stays HUGEINT (Σc² nears BIGINT range once hourly
            -- counts reach ~1e9; n*t2 is far past it — ADVICE r8's
            -- long-multiply-before-widen class)
            SELECT event_type,
                   CAST(SUM(k) AS BIGINT) AS n,
                   CAST(SUM(s1) AS BIGINT) AS t1,
                   SUM(s2) AS t2
            FROM g GROUP BY event_type
        ),
        ssw AS (
            SELECT event_type,
                   SUM(CAST(ROUND(CAST(k * s2 - CAST(s1 AS HUGEINT) * s1
                                       AS DOUBLE)
                                  / CAST(k AS DOUBLE), 9)
                            AS DECIMAL(28,12))) AS w
            FROM g GROUP BY event_type
        )
        SELECT t.event_type,
               t.n AS n_hours,
               CAST(CAST(ssw.w AS VARCHAR) AS DOUBLE) AS ss_within,
               CAST(CAST(t.n AS HUGEINT) * t.t2
                    - CAST(t.t1 AS HUGEINT) * t.t1 AS DOUBLE)
                   / CAST(t.n AS DOUBLE) AS ss_total,
               CASE WHEN CAST(t.n AS HUGEINT) * t.t2
                         - CAST(t.t1 AS HUGEINT) * t.t1 = 0 THEN NULL
                    ELSE 1.0 - CAST(CAST(ssw.w AS VARCHAR) AS DOUBLE)
                         / (CAST(CAST(t.n AS HUGEINT) * t.t2
                                 - CAST(t.t1 AS HUGEINT) * t.t1 AS DOUBLE)
                            / CAST(t.n AS DOUBLE))
               END AS seasonal_strength
        FROM tot t JOIN ssw ON ssw.event_type = t.event_type
        ORDER BY t.event_type
    """,
    doc="Hour-of-day seasonal STRENGTH per event type: the share of "
    "hourly-count variance explained by the hour-of-day profile — "
    "one-way ANOVA R^2 with groups = hod over the hourly series "
    "(Hyndman's seasonal-strength measure with the seasonal means "
    "as the fitted component). ts_seasonality_profile shows the "
    "SHAPE of the daily cycle; this op gives the one-number "
    "strength that says whether that shape matters (near 0 = flat "
    "demand, near 1 = almost fully periodic — the signal that "
    "decides whether capacity planning needs hourly granularity). "
    "Exact-parity arithmetic per agg_anova_oneway: integer "
    "sufficient sums per hod group, per-group SSW terms as single "
    "divisions rounded once into DECIMAL, SST cleared to "
    "(n*S2-S1^2)/n, strength as the identical final chain. Plan: "
    "two bounded aggregates after the hourly rollup (grid is "
    "calendar-bounded: |hours| x |types|); the raw-event volume is "
    "absorbed by the first map-side-combinable groupBy.",
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"),
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("hod"),
    ).agg(F.count("*").cast("long").alias("c"))
    # widen BEFORE multiplying (ADVICE r8): c² and s1² in DECIMAL(38,0),
    # never long*long that wraps first
    g = hourly.groupBy("event_type", "hod").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).cast("decimal(38,0)").alias("s2"),
    )
    g = g.localCheckpoint()  # bounded |types| x 24 rows, used twice
    tot = g.groupBy("event_type").agg(
        F.sum("k").cast("long").alias("n"),
        F.sum("s1").cast("long").alias("t1"),
        F.sum("s2").cast("decimal(38,0)").alias("t2"),
    )
    ssw = g.groupBy("event_type").agg(
        F.sum(
            F.round(
                (
                    F.col("k") * F.col("s2")
                    - F.col("s1").cast("decimal(38,0)") * F.col("s1")
                ).cast("double")
                / F.col("k").cast("double"),
                9,
            ).cast("decimal(28,12)")
        ).alias("w")
    )
    sst_num = (
        F.col("n") * F.col("t2")
        - F.col("t1").cast("decimal(38,0)") * F.col("t1")
    ).cast("double")
    sst = sst_num / F.col("n").cast("double")
    return (
        tot.join(ssw, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("w").cast("double").alias("ss_within"),
            sst.alias("ss_total"),
            F.when(sst_num == 0, F.lit(None).cast("double"))
            .otherwise(F.lit(1.0) - F.col("w").cast("double") / sst)
            .alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_dow_hour_heatmap",
    # ISO day-of-week x hour grid (DuckDB ISODOW == Spark weekday()+1,
    # both Monday-anchored); exact BIGINT counts, row shares in exact
    # ppm over each day-of-week's total.
    oracle="""
        WITH g AS (
            SELECT CAST(ISODOW(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
                   CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
                       AS hod,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        t AS (
            SELECT dow, CAST(SUM(n) AS BIGINT) AS dow_total
            FROM g GROUP BY dow
        )
        SELECT g.dow, g.hod, g.n, t.dow_total,
               CAST(CAST(g.n AS HUGEINT) * 1000000 // t.dow_total
                    AS BIGINT) AS share_of_dow_ppm
        FROM g JOIN t ON t.dow = g.dow
        ORDER BY g.dow, g.hod
    """,
    doc="Day-of-week x hour-of-day traffic heatmap — the capacity-"
    "planning grid behind every ops dashboard (weekday-vs-weekend "
    "shape, the Monday-morning spike, the deploy-window trough), "
    "complementing ts_seasonality_profile (hour only) and "
    "ts_seasonal_strength (one-number hour effect) with the full "
    "two-way profile. ISO Monday-anchored day numbering aligned "
    "across engines (DuckDB ISODOW == Spark weekday()+1 — the "
    "dayofweek() Sunday-anchor mismatch is the trap this op's "
    "spelling documents); exact counts, each cell's share of its "
    "day-of-week total in exact ppm. Plan: one map-side-combinable "
    "aggregate to the bounded 7x24 grid; everything after runs on "
    "<= 168 rows.",
)
def ts_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    g = e.groupBy(
        (F.weekday(F.col("ts").cast("timestamp")) + 1)
        .cast("long")
        .alias("dow"),
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("hod"),
    ).agg(F.count("*").cast("long").alias("n"))
    t = g.groupBy("dow").agg(F.sum("n").cast("long").alias("dow_total"))
    return (
        g.join(F.broadcast(t), "dow")
        .select(
            "dow",
            "hod",
            "n",
            "dow_total",
            F.expr(
                "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV dow_total"
                " AS BIGINT)"
            ).alias("share_of_dow_ppm"),
        )
        .orderBy("dow", "hod")
    )


@register(
    "ts_holt_linear_portable",
    # Holt's linear-trend smoother with alpha=1/2, beta=1/4 run as an
    # INTEGER fixed-point recursion (floor divisions via the pmod
    # identity, so negative trends floor identically in both engines):
    # l_t = floor((y_t + l_{t-1} + b_{t-1})/2),
    # b_t = floor((l_t - l_{t-1} + 3*b_{t-1})/4).
    # A float recurrence could never hash-match across engines
    # (graph_pagerank's lesson); the integer recursion replays exactly
    # in DuckDB's WITH RECURSIVE and in the bounded driver-side fold.
    oracle="""
        WITH RECURSIVE daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 1000) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        g AS (
            SELECT day, y,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM daily
        ),
        h AS (
            SELECT rn, day, y, y AS l, CAST(0 AS BIGINT) AS b
            FROM g WHERE rn = 1
            UNION ALL
            SELECT g.rn, g.day, g.y,
                   CAST((g.y + h.l + h.b
                         - ((((g.y + h.l + h.b) % 2) + 2) % 2)) // 2
                        AS BIGINT) AS l,
                   CAST((((g.y + h.l + h.b
                           - ((((g.y + h.l + h.b) % 2) + 2) % 2)) // 2)
                          - h.l + 3 * h.b
                         - ((((((g.y + h.l + h.b
                                 - ((((g.y + h.l + h.b) % 2) + 2) % 2))
                                // 2) - h.l + 3 * h.b) % 4) + 4) % 4)
                        ) // 4 AS BIGINT) AS b
            FROM g JOIN h ON g.rn = h.rn + 1
        )
        SELECT CAST(day AS TIMESTAMP) AS day, y AS y_milli,
               l AS level_milli, b AS trend_milli,
               CAST(l + b AS BIGINT) AS forecast_next_milli
        FROM h ORDER BY day
    """,
    doc="Holt's linear-trend exponential smoother over the daily "
    "purchase-value series (alpha=1/2 level, beta=1/4 trend), the "
    "classic level+trend forecaster one step up from EWMA — emitted "
    "per day with the one-step-ahead forecast l+b, in exact milli "
    "units. The recursion is computed in pure INTEGER fixed point "
    "(floor-div halving/quartering with the pmod identity), so the "
    "whole state trajectory is engine-exact — the "
    "markov/pagerank/kmeans fixed-point discipline applied to a "
    "sequential smoother; DuckDB replays it as a recursive CTE, "
    "Spark folds it over the collected CALENDAR-BOUNDED day grid "
    "(<= |days| rows regardless of corpus size — the survival-family "
    "bounded-grid rule; the distributed work is the one daily "
    "aggregate, which is the only corpus-scale edge at 100 TB).",
)
def ts_holt_linear_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(FLOOR(value * 1000) AS BIGINT)"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("y")
        )
        .orderBy("day")
        .collect()  # calendar-bounded day grid — driver-side fold is OK
    )
    out_schema = (
        "day timestamp, y_milli bigint, level_milli bigint,"
        " trend_milli bigint, forecast_next_milli bigint"
    )
    if not daily:
        return spark.createDataFrame([], out_schema)
    rows = []
    l = b = 0
    for i, r in enumerate(daily):
        y = int(r.y)
        if i == 0:
            l, b = y, 0
        else:
            l_new = (y + l + b) // 2  # Python // floors — pmod-exact
            b = (l_new - l + 3 * b) // 4
            l = l_new
        day = datetime.datetime(r.day.year, r.day.month, r.day.day)
        rows.append((day, y, l, b, l + b))
    return spark.createDataFrame(rows, out_schema).orderBy("day")


@register(
    "ts_croston_portable",
    oracle="""
        WITH demand AS (
            SELECT user_id,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS z
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        seq AS (
            SELECT user_id, day, z,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                       AS rn,
                   CAST(DATEDIFF('day',
                        LAG(day) OVER (PARTITION BY user_id ORDER BY day),
                        day) AS BIGINT) AS q,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_demand_days
            FROM demand
        ),
        p AS (
            SELECT user_id,
                   MAX(n_demand_days) AS n_demand_days,
                   MAX(CASE WHEN rn = 1 THEN z END) AS z1,
                   MAX(CASE WHEN rn = 2 THEN z END) AS z2,
                   MAX(CASE WHEN rn = 3 THEN z END) AS z3,
                   MAX(CASE WHEN rn = 4 THEN z END) AS z4,
                   MAX(CASE WHEN rn = 2 THEN q END) AS q2,
                   MAX(CASE WHEN rn = 3 THEN q END) AS q3,
                   MAX(CASE WHEN rn = 4 THEN q END) AS q4,
                   MAX(CASE WHEN rn = 1 THEN day END) AS first_day,
                   MAX(CASE WHEN rn = 4 THEN day END) AS fourth_day
            FROM seq WHERE rn <= 4
            GROUP BY user_id
            HAVING MAX(n_demand_days) >= 4
        )
        SELECT user_id, n_demand_days,
               CAST(first_day AS TIMESTAMP) AS first_day,
               CAST(fourth_day AS TIMESTAMP) AS fourth_day,
               CAST(343 * z1 + 49 * z2 + 56 * z3 + 64 * z4 AS BIGINT)
                   AS z_smoothed_x512,
               CAST(49 * q2 + 7 * q3 + 8 * q4 AS BIGINT)
                   AS q_smoothed_x64,
               CAST((343 * z1 + 49 * z2 + 56 * z3 + 64 * z4) * 125000
                    // (49 * q2 + 7 * q3 + 8 * q4) AS BIGINT)
                   AS croston_rate_ppm
        FROM p
        ORDER BY user_id
    """,
    doc="Croston's intermittent-demand forecast per user — the standard "
    "estimator for sparse event series (most users purchase on few "
    "days; plain EWMA over the calendar under-forecasts between "
    "demands): demand SIZE (purchases per demand day) and demand "
    "INTERVAL (days between demand days) are smoothed separately by "
    "exponential smoothing with alpha = 1/8 over each user's first "
    "FOUR demand occurrences, and the demand rate forecast is their "
    "ratio. alpha = 1/8 makes the SES closed form exact in integers "
    "(x512 for the 4-term size smoother: 343/49/56/64; x64 for the "
    "3-term interval smoother: 49/7/8 — coefficient sums are exactly "
    "the scale), so sizes, intervals, and the ppm rate are all "
    "hash-exact BIGINTs with truncating division on both engines. "
    "Fixed-occurrence-count unrolling is what makes the sequential "
    "smoother relational: rank demand days per user, pivot the first "
    "four, fold in closed form — no recursion, no driver collect. "
    "Scale: one (user, day) aggregate + one per-user window over "
    "demand days only; series count is unbounded but per-series state "
    "is 4 pivoted rows — the embarrassingly-parallel per-key shape.",
)
def ts_croston_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    demand = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("z"))
    w = W.partitionBy("user_id").orderBy("day")
    seq = demand.select(
        "user_id",
        "day",
        "z",
        F.row_number().over(w).alias("rn"),
        F.datediff(F.col("day"), F.lag("day").over(w))
        .cast("long")
        .alias("q"),
        F.count("*").over(W.partitionBy("user_id")).alias("n_demand_days"),
    )
    p = (
        seq.where("rn <= 4")
        .groupBy("user_id")
        .agg(
            F.max("n_demand_days").alias("n_demand_days"),
            *[
                F.max(F.when(F.col("rn") == k, F.col("z"))).alias(f"z{k}")
                for k in (1, 2, 3, 4)
            ],
            *[
                F.max(F.when(F.col("rn") == k, F.col("q"))).alias(f"q{k}")
                for k in (2, 3, 4)
            ],
            F.max(F.when(F.col("rn") == 1, F.col("day"))).alias("first_day"),
            F.max(F.when(F.col("rn") == 4, F.col("day"))).alias("fourth_day"),
        )
        .where("n_demand_days >= 4")
    )
    return p.select(
        "user_id",
        "n_demand_days",
        F.col("first_day").cast("timestamp").alias("first_day"),
        F.col("fourth_day").cast("timestamp").alias("fourth_day"),
        F.expr("CAST(343*z1 + 49*z2 + 56*z3 + 64*z4 AS BIGINT)").alias(
            "z_smoothed_x512"
        ),
        F.expr("CAST(49*q2 + 7*q3 + 8*q4 AS BIGINT)").alias(
            "q_smoothed_x64"
        ),
        F.expr(
            "CAST((343*z1 + 49*z2 + 56*z3 + 64*z4) * 125000 DIV "
            "(49*q2 + 7*q3 + 8*q4) AS BIGINT)"
        ).alias("croston_rate_ppm"),
    ).orderBy("user_id")


ITS_BREAK = "2024-01-16"  # intervention date splitting the 30-day fixture


@register(
    "ts_interrupted_series",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                       AS y
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        seg AS (
            SELECT CASE WHEN day < DATE '{ITS_BREAK}' THEN 'pre'
                        ELSE 'post' END AS segment,
                   CAST(day - DATE '{ITS_BREAK}' AS BIGINT) AS x, y
            FROM daily
        ),
        fit AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy
            FROM seg GROUP BY 1
        )
        SELECT segment, n_days, sy AS sum_y_milli,
               -- single-day segment (fully tied timestamps): the slope
               -- denominator n*Sxx - Sx^2 vanishes, the fit is
               -- underdetermined -> NULL slope, level = the one mean
               CASE WHEN CAST(n_days AS HUGEINT) * sxx
                         = CAST(sx AS HUGEINT) * sx THEN NULL
               ELSE ROUND(CAST(CAST(n_days AS HUGEINT) * sxy
                          - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(CAST(n_days AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
               END AS slope_milli_per_day,
               CASE WHEN CAST(n_days AS HUGEINT) * sxx
                         = CAST(sx AS HUGEINT) * sx
               THEN ROUND(CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
               ELSE ROUND((CAST(sy AS DOUBLE)
                      - (CAST(CAST(n_days AS HUGEINT) * sxy
                              - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                         / CAST(CAST(n_days AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                        * CAST(sx AS DOUBLE))
                     / CAST(n_days AS DOUBLE), 6)
               END AS level_at_break_milli
        FROM fit
        ORDER BY segment
    """,
    doc=f"Interrupted time-series analysis — the quasi-experimental "
    f"readout when a change ships on a known date ({ITS_BREAK}) and "
    f"no control group exists (diff-in-diff's sibling; "
    f"agg_diff_in_diff needs both arms): closed-form OLS level and "
    f"slope fitted SEPARATELY to the pre and post segments of the "
    f"daily purchase-value series, with day re-indexed to the break "
    f"(x=0 at intervention) so each segment's intercept IS its level "
    f"at the break — the level discontinuity and slope change read "
    f"directly off the two rows. Sufficient statistics (Sx, Sy, Sxx, "
    f"Sxy) accumulate as exact 128-bit integers over milli-scaled "
    f"values; both engines run the IDENTICAL final double chain "
    f"(slope = (nSxy-SxSy)/(nSxx-Sx^2), level = (Sy - slope*Sx)/n), "
    f"rounded once to 6dp. Plan: one daily aggregate (calendar-"
    f"bounded), one 2-group aggregate — the raw event volume is "
    f"absorbed by the first map-side-combinable groupBy at any "
    f"corpus size.",
)
def ts_interrupted_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 1000) AS BIGINT)"))
        .cast("long")
        .alias("y")
    )
    seg = daily.select(
        F.expr(
            f"CASE WHEN day < DATE '{ITS_BREAK}' THEN 'pre' ELSE 'post' END"
        ).alias("segment"),
        F.datediff(F.col("day"), F.lit(ITS_BREAK).cast("date"))
        .cast("long")
        .alias("x"),
        "y",
    )
    fit = seg.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sxx"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * y)").alias("sxy"),
    )
    slope = (
        "CAST(CAST(n_days AS DECIMAL(38,0)) * sxy"
        " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
        " / CAST(CAST(n_days AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
    )
    degen = (
        "CAST(n_days AS DECIMAL(38,0)) * sxx"
        " = CAST(sx AS DECIMAL(38,0)) * sx"
    )
    return fit.select(
        "segment",
        "n_days",
        F.col("sy").alias("sum_y_milli"),
        F.expr(
            f"CASE WHEN {degen} THEN NULL ELSE ROUND({slope}, 6) END"
        ).alias("slope_milli_per_day"),
        F.expr(
            f"CASE WHEN {degen}"
            f" THEN ROUND(CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE), 6)"
            f" ELSE ROUND((CAST(sy AS DOUBLE) - ({slope})"
            f" * CAST(sx AS DOUBLE)) / CAST(n_days AS DOUBLE), 6) END"
        ).alias("level_at_break_milli"),
    ).orderBy("segment")


HOLIDAYS = ("2024-01-05", "2024-01-15", "2024-01-25")  # audited event days


@register(
    "ts_holiday_lift",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                       AS y
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        dowd AS (
            SELECT day, y,
                   CAST((((day - DATE '2024-01-01') % 7) + 7) % 7
                        AS BIGINT) AS dow
            FROM daily
        ),
        hol AS (
            SELECT CAST(h.d AS DATE) AS day
            FROM (VALUES {", ".join(f"('{h}')" for h in HOLIDAYS)}) h(d)
        ),
        base AS (
            SELECT h.day,
                   hd.dow,
                   hd.y AS day_value_milli,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM dowd b
                    WHERE b.dow = hd.dow AND b.day <> h.day)
                       AS baseline_days,
                   (SELECT CAST(COALESCE(SUM(b.y), 0) AS BIGINT) FROM dowd b
                    WHERE b.dow = hd.dow AND b.day <> h.day)
                       AS baseline_value_milli
            FROM hol h JOIN dowd hd ON hd.day = h.day
        )
        SELECT CAST(day AS TIMESTAMP) AS day, dow, day_value_milli,
               baseline_days, baseline_value_milli,
               CASE WHEN baseline_value_milli = 0 THEN NULL
                    ELSE CAST(day_value_milli * baseline_days * 1000000
                              // baseline_value_milli AS BIGINT)
               END AS lift_ppm
        FROM base
        ORDER BY day
    """,
    doc=f"Holiday / event-day lift audit — daily purchase value on each "
    f"audited day ({HOLIDAYS}) against the SAME-day-of-week baseline "
    f"(all other matching weekdays in the window), the seasonality-"
    f"aware comparison a flat daily average would get wrong by the "
    f"weekly cycle ts_seasonality_profile measures. lift_ppm = "
    f"day*n_baseline*1e6 // sum_baseline is a single exact integer "
    f"division (1e6 = at-baseline, 2e6 = 2x); zero-baseline emits "
    f"NULL oracle-mirrored. Plan: one calendar-bounded daily "
    f"aggregate; the per-holiday baselines are |days|-bounded "
    f"correlated lookups the optimizer folds into one pass over the "
    f"~30-row grid.",
)
def ts_holiday_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 1000) AS BIGINT)"))
        .cast("long")
        .alias("y")
    )
    dowd = daily.select(
        "day",
        "y",
        F.pmod(
            F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")),
            F.lit(7),
        )
        .cast("long")
        .alias("dow"),
    )
    dowd = dowd.localCheckpoint()  # ~30-row calendar grid, read twice
    hol = spark.createDataFrame(
        [(h,) for h in HOLIDAYS], "d string"
    ).select(F.col("d").cast("date").alias("hday"))
    hd = dowd.join(
        F.broadcast(hol), F.col("day") == F.col("hday")
    ).select(
        F.col("day").alias("hday2"),
        F.col("dow").alias("hdow"),
        F.col("y").alias("day_value_milli"),
    )
    base = (
        dowd.join(
            F.broadcast(hd),
            (F.col("dow") == F.col("hdow")) & (F.col("day") != F.col("hday2")),
        )
        .groupBy(
            F.col("hday2").alias("day"),
            F.col("hdow").alias("dow"),
            "day_value_milli",
        )
        .agg(
            F.count("*").cast("long").alias("baseline_days"),
            F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias(
                "baseline_value_milli"
            ),
        )
    )
    return base.select(
        F.col("day").cast("timestamp").alias("day"),
        "dow",
        "day_value_milli",
        "baseline_days",
        "baseline_value_milli",
        F.expr(
            "CASE WHEN baseline_value_milli = 0 THEN NULL"
            " ELSE CAST(day_value_milli * baseline_days * 1000000"
            " DIV baseline_value_milli AS BIGINT) END"
        ).alias("lift_ppm"),
    ).orderBy("day")


@register(
    "ts_variance_ratio",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT d, x - LAG(x) OVER (ORDER BY d) AS dx
            FROM daily
        ),
        qsum AS (
            SELECT dx,
                   SUM(dx) OVER (ORDER BY d
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sq,
                   ROW_NUMBER() OVER (ORDER BY d) AS rn
            FROM diffs WHERE dx IS NOT NULL
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                   CAST(SUM(dx) AS BIGINT) AS sd,
                   CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sdd,
                   CAST(SUM(CASE WHEN rn >= 5 THEN 1 ELSE 0 END) AS BIGINT)
                       AS nq,
                   CAST(SUM(CASE WHEN rn >= 5 THEN sq ELSE 0 END) AS BIGINT)
                       AS ssq,
                   CAST(SUM(CASE WHEN rn >= 5 THEN CAST(sq AS HUGEINT) * sq
                            ELSE 0 END) AS HUGEINT) AS ssqq
            FROM qsum
        )
        SELECT nd AS n_diffs, nq AS n_windows,
               CASE WHEN nd = 0 OR nq = 0
                         OR nd * sdd - CAST(sd AS HUGEINT) * sd = 0 THEN NULL
                    ELSE ROUND(
                        (CAST(nq * ssqq - CAST(ssq AS HUGEINT) * ssq
                              AS DOUBLE) / (CAST(nq AS DOUBLE) * nq))
                        / (5.0 * CAST(nd * sdd - CAST(sd AS HUGEINT) * sd
                                      AS DOUBLE) / (CAST(nd AS DOUBLE) * nd)),
                        6)
               END AS vr5,
               CASE WHEN nd = 0 OR nq = 0
                         OR nd * sdd - CAST(sd AS HUGEINT) * sd = 0 THEN NULL
                    ELSE ROUND(
                        ((CAST(nq * ssqq - CAST(ssq AS HUGEINT) * ssq
                               AS DOUBLE) / (CAST(nq AS DOUBLE) * nq))
                         / (5.0 * CAST(nd * sdd - CAST(sd AS HUGEINT) * sd
                                       AS DOUBLE) / (CAST(nd AS DOUBLE) * nd))
                         - 1.0)
                        * SQRT(CAST(nd AS DOUBLE))
                        / SQRT(2.0 * 9.0 * 4.0 / 15.0), 6)
               END AS z
        FROM s
        WHERE nd > 0
    """,
    doc="Lo-MacKinlay variance-ratio test (q=5) on the daily-revenue "
    "random walk: VR = Var(5-day overlapping sums)/(5·Var(1-day "
    "diffs)) — VR≈1 under a random walk, <1 mean reversion, >1 "
    "momentum. Diffs and their 5-window sums stay EXACT integer "
    "cents (one LAG + one bounded ROWS window over the calendar day "
    "grid); both variances are (n·Σv²-(Σv)²)/n² with 128-bit "
    "numerators, and VR and the homoskedastic z = (VR-1)·√n/"
    "√(2(2q-1)(q-1)/3q) are ONE fixed float expression each. "
    "Zero-variance / short grids emit NULL oracle-mirrored. Plan at "
    "100 TB: one map-side-combinable daily hash agg; windows run on "
    "the CALENDAR-bounded day table (constant cost).",
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    diffs = daily.select(
        "d", (F.col("x") - F.lag("x").over(Window.orderBy("d"))).alias("dx")
    ).where("dx IS NOT NULL")
    qsum = diffs.select(
        "dx",
        F.sum("dx").over(Window.orderBy("d").rowsBetween(-4, 0)).alias("sq"),
        F.row_number().over(Window.orderBy("d")).alias("rn"),
    )
    s = qsum.agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("dx").cast("long").alias("sd"),
        F.sum(F.expr("CAST(dx AS DECIMAL(38,0)) * dx")).alias("sdd"),
        F.sum(F.expr("CASE WHEN rn >= 5 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("nq"),
        F.sum(F.expr("CASE WHEN rn >= 5 THEN sq ELSE 0 END"))
        .cast("long")
        .alias("ssq"),
        F.sum(
            F.expr(
                "CASE WHEN rn >= 5 THEN CAST(sq AS DECIMAL(38,0)) * sq"
                " ELSE 0 END"
            )
        ).alias("ssqq"),
    )
    var1 = "CAST(nd * sdd - CAST(sd AS DECIMAL(38,0)) * sd AS DOUBLE) / (CAST(nd AS DOUBLE) * nd)"
    varq = "CAST(nq * ssqq - CAST(ssq AS DECIMAL(38,0)) * ssq AS DOUBLE) / (CAST(nq AS DOUBLE) * nq)"
    guard = "nd = 0 OR nq = 0 OR nd * sdd - CAST(sd AS DECIMAL(38,0)) * sd = 0"
    return s.where("nd > 0").select(
        F.col("nd").alias("n_diffs"),
        F.col("nq").alias("n_windows"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            f" ELSE ROUND(({varq}) / (5.0 * {var1}), 6) END"
        ).alias("vr5"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            f" ELSE ROUND((({varq}) / (5.0 * {var1}) - 1.0)"
            f" * SQRT(CAST(nd AS DOUBLE)) / SQRT(2.0 * 9.0 * 4.0 / 15.0), 6)"
            f" END"
        ).alias("z"),
    )


@register(
    "ts_turning_points",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS hr,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                       AS v3
            FROM events GROUP BY 1, 2
        ),
        ctx AS (
            SELECT event_type, v3,
                   LAG(v3) OVER (PARTITION BY event_type ORDER BY hr)
                       AS pv,
                   LEAD(v3) OVER (PARTITION BY event_type ORDER BY hr)
                       AS nv
            FROM hourly
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                            AND ((pv < v3 AND v3 > nv)
                                 OR (pv > v3 AND v3 < nv))
                            THEN 1 ELSE 0 END) AS BIGINT) AS tp
            FROM ctx GROUP BY 1
        )
        SELECT event_type, n, tp,
               ROUND(2.0 * (n - 2) / 3.0, 6) AS e_tp,
               CASE WHEN 16 * n - 29 <= 0 OR n < 3 THEN NULL
                    ELSE ROUND((tp - 2.0 * (n - 2) / 3.0)
                         / SQRT((16.0 * n - 29.0) / 90.0), 6)
               END AS z
        FROM s
        WHERE n >= 3
        ORDER BY event_type
    """,
    doc="Turning-points randomness test per event type: an interior "
    "hour is a turning point when its exact milli-summed value is a "
    "strict local max or min of its hourly neighbors (integer "
    "compares — binned ties are real ties and never count); under "
    "randomness E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90 (the "
    "classic Kendall counts), z as ONE fixed float expression. Too "
    "few hours or degenerate variance emit nothing / NULL oracle-"
    "mirrored. The cheap first-line seasonality screen beside "
    "ts_periodogram (which localizes the frequency this test only "
    "detects). Plan at 100 TB: one map-side-combinable hourly hash "
    "agg; LAG/LEAD run per-type on the CALENDAR-bounded hour grid "
    "(720 rows/type/month — constant cost at any corpus scale).",
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hr"),
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v3")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    ctx = hourly.select(
        "event_type",
        "v3",
        F.lag("v3").over(w).alias("pv"),
        F.lead("v3").over(w).alias("nv"),
    )
    s = ctx.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("pv").isNotNull()
                & F.col("nv").isNotNull()
                & (
                    ((F.col("pv") < F.col("v3")) & (F.col("v3") > F.col("nv")))
                    | ((F.col("pv") > F.col("v3")) & (F.col("v3") < F.col("nv")))
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("tp"),
    )
    return (
        s.where("n >= 3")
        .select(
            "event_type",
            "n",
            "tp",
            F.expr(
                "ROUND(CAST(2.0 AS DOUBLE) * (n - 2) / 3.0, 6)"
            ).alias("e_tp"),
            F.expr(
                "CASE WHEN 16 * n - 29 <= 0 OR n < 3 THEN NULL"
                " ELSE ROUND((tp - 2.0 * (n - 2) / 3.0)"
                " / SQRT((16.0 * n - 29.0) / 90.0), 6) END"
            ).alias("z"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_hurst_rs",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM orders GROUP BY 1
        ),
        idx AS (
            SELECT v, ROW_NUMBER() OVER (ORDER BY d) - 1 AS rn FROM daily
        ),
        sized AS (
            SELECT s.s, idx.v, idx.rn,
                   idx.rn // s.s AS blk,
                   ROW_NUMBER() OVER (PARTITION BY s.s, idx.rn // s.s
                                      ORDER BY idx.rn) AS pos
            FROM idx, (SELECT UNNEST([16, 32, 64]) AS s) s
        ),
        blksum AS (
            SELECT s, blk,
                   CAST(SUM(v) AS BIGINT) AS s1,
                   CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM sized GROUP BY 1, 2
        ),
        cum AS (
            SELECT sized.s, sized.blk,
                   SUM(CAST(sized.s AS HUGEINT) * sized.v)
                       OVER (PARTITION BY sized.s, sized.blk
                             ORDER BY sized.pos) -
                   sized.pos * CAST(b.s1 AS HUGEINT) AS z
            FROM sized JOIN blksum b
              ON b.s = sized.s AND b.blk = sized.blk AND b.cnt = sized.s
        ),
        rs AS (
            SELECT cum.s, cum.blk,
                   CAST(FLOOR(1000000.0 *
                       CAST(MAX(cum.z) - MIN(cum.z) AS DOUBLE)
                       / SQRT(CAST(b.s * b.s2
                              - CAST(b.s1 AS HUGEINT) * b.s1 AS DOUBLE)))
                       AS BIGINT) AS rs_ppm
            FROM cum JOIN blksum b ON b.s = cum.s AND b.blk = cum.blk
            WHERE b.s * b.s2 - CAST(b.s1 AS HUGEINT) * b.s1 > 0
            GROUP BY cum.s, cum.blk, b.s1, b.s2, b.s
        ),
        bysize AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(rs_ppm) AS BIGINT) AS sum_rs_ppm
            FROM rs GROUP BY s
        ),
        piv AS (
            SELECT
              MAX(CASE WHEN s = 16 THEN n_blocks END) AS blocks_16,
              MAX(CASE WHEN s = 16 THEN sum_rs_ppm END) AS rs_ppm_16,
              MAX(CASE WHEN s = 32 THEN n_blocks END) AS blocks_32,
              MAX(CASE WHEN s = 32 THEN sum_rs_ppm END) AS rs_ppm_32,
              MAX(CASE WHEN s = 64 THEN n_blocks END) AS blocks_64,
              MAX(CASE WHEN s = 64 THEN sum_rs_ppm END) AS rs_ppm_64
            FROM bysize
        )
        SELECT blocks_16, rs_ppm_16, blocks_32, rs_ppm_32,
               blocks_64, rs_ppm_64,
               CASE WHEN blocks_16 IS NULL OR blocks_64 IS NULL
                         OR rs_ppm_16 <= 0 OR rs_ppm_64 <= 0 THEN NULL
                    ELSE ROUND(LOG2(
                        (CAST(rs_ppm_64 AS DOUBLE) / blocks_64)
                        / (CAST(rs_ppm_16 AS DOUBLE) / blocks_16)) / 2.0, 6)
               END AS hurst
        FROM piv
        WHERE blocks_16 IS NOT NULL OR blocks_32 IS NOT NULL
              OR blocks_64 IS NOT NULL
    """,
    doc="Hurst exponent via rescaled-range (R/S) analysis of the daily "
    "revenue series: for block sizes 16/32/64 consecutive observed "
    "days, R = range of the s-scaled cumulative deviations (z_k = "
    "s·Σv - k·S1, EXACT 128-bit integers — no float mean ever enters "
    "the cumsum) and S from the exact block moments; each block's "
    "R/S is ONE float sqrt+divide, immediately FLOOR-quantized to "
    "ppm so the per-size totals are exact integer sums (no engine-"
    "ordered float aggregation over blocks), and H = log2(avgRS_64 / "
    "avgRS_16)/2 — the two-point slope of the log-log line, one LOG2 "
    "rounded at 6dp. Incomplete trailing blocks are dropped (cnt = "
    "s), zero-variance blocks skipped; missing sizes emit NULL "
    "oracle-mirrored. H≈0.5 random walk, >0.5 persistent trend. Plan "
    "at 100 TB: one map-side-combinable daily hash agg; the 3-size "
    "fan-out and block windows run on the CALENDAR-bounded day grid "
    "(≤3·2400 rows — the pgram bounded-fan-out shape).",
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    idx = daily.select(
        "v", (F.row_number().over(Window.orderBy("d")) - 1).alias("rn")
    )
    sizes = spark.range(1).select(
        F.explode(F.array(F.lit(16), F.lit(32), F.lit(64))).alias("s")
    )
    sized = idx.crossJoin(F.broadcast(sizes)).select(
        "s",
        "v",
        "rn",
        F.expr("rn DIV s").alias("blk"),
        F.row_number()
        .over(Window.partitionBy("s", F.expr("rn DIV s")).orderBy("rn"))
        .alias("pos"),
    )
    sized = sized.localCheckpoint()  # ≤3×|days| rows, read twice
    blksum = sized.groupBy("s", "blk").agg(
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("s2"),
        F.count("*").cast("long").alias("cnt"),
    )
    b = blksum.alias("b")
    sz = sized.alias("sz")
    cum = (
        sz.join(
            b,
            (F.col("b.s") == F.col("sz.s"))
            & (F.col("b.blk") == F.col("sz.blk"))
            & (F.col("b.cnt") == F.col("sz.s")),
        )
        .select(
            F.col("sz.s").alias("s"),
            F.col("sz.blk").alias("blk"),
            F.col("sz.pos").alias("pos"),
            (
                F.sum(F.expr("CAST(sz.s AS DECIMAL(38,0)) * sz.v")).over(
                    Window.partitionBy("sz.s", "sz.blk").orderBy("sz.pos")
                )
                - F.col("sz.pos") * F.col("b.s1").cast("decimal(38,0)")
            ).alias("z"),
            F.col("b.s1").alias("s1"),
            F.col("b.s2").alias("s2"),
        )
    )
    rs = (
        cum.where(
            F.expr("s * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 > 0")
        )
        .groupBy("s", "blk", "s1", "s2")
        .agg(
            F.expr(
                "CAST(FLOOR(1000000.0 *"
                " CAST(MAX(z) - MIN(z) AS DOUBLE)"
                " / SQRT(CAST(s * s2 - CAST(s1 AS DECIMAL(38,0)) * s1"
                "        AS DOUBLE))) AS BIGINT)"
            ).alias("rs_ppm")
        )
    )
    bysize = rs.groupBy("s").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("rs_ppm").cast("long").alias("sum_rs_ppm"),
    )
    piv = bysize.agg(
        *[
            F.max(F.when(F.col("s") == k, F.col(c))).alias(f"{out}_{k}")
            for k in (16, 32, 64)
            for c, out in (("n_blocks", "blocks"), ("sum_rs_ppm", "rs_ppm"))
        ]
    )
    return piv.where(
        "blocks_16 IS NOT NULL OR blocks_32 IS NOT NULL"
        " OR blocks_64 IS NOT NULL"
    ).select(
        "blocks_16",
        "rs_ppm_16",
        "blocks_32",
        "rs_ppm_32",
        "blocks_64",
        "rs_ppm_64",
        F.expr(
            "CASE WHEN blocks_16 IS NULL OR blocks_64 IS NULL"
            " OR rs_ppm_16 <= 0 OR rs_ppm_64 <= 0 THEN NULL"
            " ELSE ROUND(LOG2((CAST(rs_ppm_64 AS DOUBLE) / blocks_64)"
            " / (CAST(rs_ppm_16 AS DOUBLE) / blocks_16)) / 2.0, 6) END"
        ).alias("hurst"),
    )


@register(
    "ts_pacf",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ),
        lags AS (
            SELECT CAST(st.n * daily.x - st.s AS HUGEINT) AS dv,
                   CAST(st.n * LEAD(daily.x, 1) OVER (ORDER BY daily.d)
                        - st.s AS HUGEINT) AS dv1,
                   CAST(st.n * LEAD(daily.x, 2) OVER (ORDER BY daily.d)
                        - st.s AS HUGEINT) AS dv2,
                   CAST(st.n * LEAD(daily.x, 3) OVER (ORDER BY daily.d)
                        - st.s AS HUGEINT) AS dv3
            FROM daily, st
            WHERE st.n >= 5
        ),
        mom AS (
            SELECT CAST(SUM(dv * dv) AS HUGEINT) AS den,
                   CAST(SUM(CASE WHEN dv1 IS NOT NULL THEN dv * dv1 END)
                        AS HUGEINT) AS num1,
                   CAST(SUM(CASE WHEN dv2 IS NOT NULL THEN dv * dv2 END)
                        AS HUGEINT) AS num2,
                   CAST(SUM(CASE WHEN dv3 IS NOT NULL THEN dv * dv3 END)
                        AS HUGEINT) AS num3,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lags
        )
        SELECT n AS n_days,
               CASE WHEN den = 0 THEN NULL
                    ELSE ROUND(CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE), 6)
               END AS pacf1,
               CASE WHEN den = 0
                         OR 1.0 - (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
                              * (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
                            = 0.0 THEN NULL
                    ELSE ROUND(
                        (CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE)
                         - (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
                           * (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE)))
                        / (1.0 - (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))
                             * (CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))),
                        6)
               END AS pacf2,
               CASE WHEN den = 0 THEN NULL
                    ELSE ROUND(CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE), 6)
               END AS acf3
        FROM mom
        WHERE n > 0
    """,
    doc="Partial autocorrelation (Durbin-Levinson, lags 1-2) plus the "
    "raw lag-3 ACF of the daily-revenue series — the AR-order "
    "identification readout beside ts_acf (which is per-user lag-1): "
    "deviations are EXACTLY mean-centered through the n-scaling "
    "trick (n·x - S, the ts_acf discipline), lag products paired by "
    "positional LEAD over the day grid, all numerators exact 128-bit "
    "integers; pacf1 = r1, pacf2 = (r2-r1²)/(1-r1²) as ONE fixed "
    "float expression over the two exact ratios. Zero-variance / "
    "short series emit NULL oracle-mirrored. Plan at 100 TB: one "
    "map-side-combinable daily agg; three LEADs in one window pass "
    "over the CALENDAR-bounded grid.",
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily = daily.localCheckpoint()  # calendar-bounded, read twice
    st = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    w = Window.orderBy("d")
    lags = (
        daily.crossJoin(F.broadcast(st))
        .where("n >= 5")
        .select(
            F.expr("CAST(n * x - s AS DECIMAL(38,0))").alias("dv"),
            F.expr("CAST(n AS DECIMAL(38,0))").alias("nn"),
            F.expr("CAST(s AS DECIMAL(38,0))").alias("ss"),
            F.lead("x", 1).over(w).alias("x1"),
            F.lead("x", 2).over(w).alias("x2"),
            F.lead("x", 3).over(w).alias("x3"),
        )
        .select(
            "dv",
            F.expr("nn * x1 - ss").alias("dv1"),
            F.expr("nn * x2 - ss").alias("dv2"),
            F.expr("nn * x3 - ss").alias("dv3"),
        )
    )
    mom = lags.agg(
        F.sum(F.expr("dv * dv")).alias("den"),
        F.sum(F.expr("CASE WHEN dv1 IS NOT NULL THEN dv * dv1 END")).alias(
            "num1"
        ),
        F.sum(F.expr("CASE WHEN dv2 IS NOT NULL THEN dv * dv2 END")).alias(
            "num2"
        ),
        F.sum(F.expr("CASE WHEN dv3 IS NOT NULL THEN dv * dv3 END")).alias(
            "num3"
        ),
        F.count("*").cast("long").alias("n"),
    )
    r1 = "(CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE))"
    r2 = "(CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE))"
    return mom.where("n > 0").select(
        F.col("n").alias("n_days"),
        F.expr(
            f"CASE WHEN den = 0 THEN NULL ELSE ROUND({r1}, 6) END"
        ).alias("pacf1"),
        F.expr(
            f"CASE WHEN den = 0 OR 1.0 - {r1} * {r1} = 0.0 THEN NULL"
            f" ELSE ROUND(({r2} - {r1} * {r1}) / (1.0 - {r1} * {r1}), 6) END"
        ).alias("pacf2"),
        F.expr(
            "CASE WHEN den = 0 THEN NULL"
            " ELSE ROUND(CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE), 6) END"
        ).alias("acf3"),
    )


@register(
    "ts_granger_lag1",
    oracle="""
        WITH hourly AS (
            SELECT CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS hr,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 1000) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y,
                   CAST(SUM(CASE WHEN event_type = 'click'
                        THEN CAST(FLOOR(value * 1000) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT hr, y,
                   LAG(y) OVER (ORDER BY hr) AS yl,
                   LAG(x) OVER (ORDER BY hr) AS xl,
                   LAG(hr) OVER (ORDER BY hr) AS hrp
            FROM hourly
        ),
        rows_ AS (
            SELECT y, yl, xl FROM lagged
            WHERE yl IS NOT NULL AND hrp = hr - INTERVAL 1 HOUR
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(yl) AS BIGINT) AS s1,
                   CAST(SUM(xl) AS BIGINT) AS s2,
                   CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
                   CAST(SUM(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS s11,
                   CAST(SUM(CAST(xl AS HUGEINT) * xl) AS HUGEINT) AS s22,
                   CAST(SUM(CAST(yl AS HUGEINT) * xl) AS HUGEINT) AS s12,
                   CAST(SUM(CAST(y AS HUGEINT) * yl) AS HUGEINT) AS sy1,
                   CAST(SUM(CAST(y AS HUGEINT) * xl) AS HUGEINT) AS sy2
            FROM rows_
        ),
        c AS (
            SELECT n,
                   n * syy - CAST(sy AS HUGEINT) * sy AS cyy,
                   n * s11 - CAST(s1 AS HUGEINT) * s1 AS c11,
                   n * s22 - CAST(s2 AS HUGEINT) * s2 AS c22,
                   n * s12 - CAST(s1 AS HUGEINT) * s2 AS c12,
                   n * sy1 - CAST(sy AS HUGEINT) * s1 AS cy1,
                   n * sy2 - CAST(sy AS HUGEINT) * s2 AS cy2
            FROM s
        )
        SELECT n AS n_hours,
               CASE WHEN c11 = 0 THEN NULL
                    ELSE ROUND((CAST(cyy AS DOUBLE) / n
                         - (CAST(cy1 AS DOUBLE) / CAST(c11 AS DOUBLE))
                           * (CAST(cy1 AS DOUBLE) / n)), 6)
               END AS sse_restricted,
               CASE WHEN c11 * c22 - c12 * c12 = 0 THEN NULL
                    ELSE ROUND((CAST(cyy AS DOUBLE) / n
                         - (CAST(cy1 * c22 - cy2 * c12 AS DOUBLE)
                            / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                           * (CAST(cy1 AS DOUBLE) / n)
                         - (CAST(cy2 * c11 - cy1 * c12 AS DOUBLE)
                            / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                           * (CAST(cy2 AS DOUBLE) / n)), 6)
               END AS sse_unrestricted,
               CASE WHEN c11 = 0 OR c11 * c22 - c12 * c12 = 0 OR n <= 3
                         OR (CAST(cyy AS DOUBLE) / n
                             - (CAST(cy1 * c22 - cy2 * c12 AS DOUBLE)
                                / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                               * (CAST(cy1 AS DOUBLE) / n)
                             - (CAST(cy2 * c11 - cy1 * c12 AS DOUBLE)
                                / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                               * (CAST(cy2 AS DOUBLE) / n)) <= 0.0
                    THEN NULL
                    ELSE ROUND(
                        ((CAST(cyy AS DOUBLE) / n
                          - (CAST(cy1 AS DOUBLE) / CAST(c11 AS DOUBLE))
                            * (CAST(cy1 AS DOUBLE) / n))
                         - (CAST(cyy AS DOUBLE) / n
                            - (CAST(cy1 * c22 - cy2 * c12 AS DOUBLE)
                               / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                              * (CAST(cy1 AS DOUBLE) / n)
                            - (CAST(cy2 * c11 - cy1 * c12 AS DOUBLE)
                               / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                              * (CAST(cy2 AS DOUBLE) / n)))
                        * (n - 3)
                        / (CAST(cyy AS DOUBLE) / n
                           - (CAST(cy1 * c22 - cy2 * c12 AS DOUBLE)
                              / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                             * (CAST(cy1 AS DOUBLE) / n)
                           - (CAST(cy2 * c11 - cy1 * c12 AS DOUBLE)
                              / CAST(c11 * c22 - c12 * c12 AS DOUBLE))
                             * (CAST(cy2 AS DOUBLE) / n)), 6)
               END AS granger_f
        FROM c
        WHERE n > 0
    """,
    doc="Granger causality (lag-1): does last hour's CLICK volume "
    "predict this hour's PURCHASE volume beyond purchase's own lag? "
    "F-test comparing the restricted (y~y_l) and unrestricted "
    "(y~y_l+x_l, Cramer 2x2 like agg_ols2) fits over adjacent-hour "
    "pairs (gap-checked LAG — missing hours never fabricate pairs): "
    "every moment is an exact integer, both SSEs use the factored "
    "(cyy/n - b·(c_y·/n)) form with exact 128-bit numerators, and "
    "F = (SSE_r - SSE_u)(n-3)/SSE_u is one fixed float expression. "
    "Singular designs / exhausted df / zero SSE_u emit NULL oracle-"
    "mirrored. Plan at 100 TB: ONE map-side-combinable hourly pivot "
    "agg over the scan; the LAG and scalar algebra run on the "
    "CALENDAR-bounded hour grid.",
)
def ts_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hr")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.sum(
            F.when(
                F.col("event_type") == "click",
                F.floor(F.col("value") * 1000).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("x"),
    )
    w = Window.orderBy("hr")
    lagged = hourly.select(
        "hr",
        "y",
        F.lag("y").over(w).alias("yl"),
        F.lag("x").over(w).alias("xl"),
        F.lag("hr").over(w).alias("hrp"),
    )
    rows_ = lagged.where(
        "yl IS NOT NULL AND hrp = hr - INTERVAL 1 HOUR"
    ).select("y", "yl", "xl")
    s = rows_.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("yl").cast("long").alias("s1"),
        F.sum("xl").cast("long").alias("s2"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        F.sum(F.expr("CAST(yl AS DECIMAL(38,0)) * yl")).alias("s11"),
        F.sum(F.expr("CAST(xl AS DECIMAL(38,0)) * xl")).alias("s22"),
        F.sum(F.expr("CAST(yl AS DECIMAL(38,0)) * xl")).alias("s12"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * yl")).alias("sy1"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * xl")).alias("sy2"),
    )
    c = s.select(
        "n",
        F.expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy").alias("cyy"),
        F.expr("n * s11 - CAST(s1 AS DECIMAL(38,0)) * s1").alias("c11"),
        F.expr("n * s22 - CAST(s2 AS DECIMAL(38,0)) * s2").alias("c22"),
        F.expr("n * s12 - CAST(s1 AS DECIMAL(38,0)) * s2").alias("c12"),
        F.expr("n * sy1 - CAST(sy AS DECIMAL(38,0)) * s1").alias("cy1"),
        F.expr("n * sy2 - CAST(sy AS DECIMAL(38,0)) * s2").alias("cy2"),
    )
    sse_r = (
        "(CAST(cyy AS DOUBLE) / n"
        " - (CAST(cy1 AS DOUBLE) / CAST(c11 AS DOUBLE))"
        "   * (CAST(cy1 AS DOUBLE) / n))"
    )
    det = "c11 * c22 - c12 * c12"
    sse_u = (
        f"(CAST(cyy AS DOUBLE) / n"
        f" - (CAST(cy1 * c22 - cy2 * c12 AS DOUBLE) / CAST({det} AS DOUBLE))"
        f"   * (CAST(cy1 AS DOUBLE) / n)"
        f" - (CAST(cy2 * c11 - cy1 * c12 AS DOUBLE) / CAST({det} AS DOUBLE))"
        f"   * (CAST(cy2 AS DOUBLE) / n))"
    )
    return c.where("n > 0").select(
        F.col("n").alias("n_hours"),
        F.expr(
            f"CASE WHEN c11 = 0 THEN NULL ELSE ROUND({sse_r}, 6) END"
        ).alias("sse_restricted"),
        F.expr(
            f"CASE WHEN {det} = 0 THEN NULL ELSE ROUND({sse_u}, 6) END"
        ).alias("sse_unrestricted"),
        F.expr(
            f"CASE WHEN c11 = 0 OR {det} = 0 OR n <= 3"
            f" OR {sse_u} <= 0.0 THEN NULL"
            f" ELSE ROUND(({sse_r} - {sse_u}) * (n - 3) / {sse_u}, 6) END"
        ).alias("granger_f"),
    )


@register(
    "ts_adf",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS y
            FROM orders GROUP BY 1
        ),
        pairs AS (
            SELECT y - LAG(y) OVER (ORDER BY d) AS dy,
                   LAG(y) OVER (ORDER BY d) AS yl
            FROM daily
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(dy) AS BIGINT) AS sy,
                   CAST(SUM(yl) AS BIGINT) AS sx,
                   CAST(SUM(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy,
                   CAST(SUM(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS sxx,
                   CAST(SUM(CAST(dy AS HUGEINT) * yl) AS HUGEINT) AS sxy
            FROM pairs WHERE yl IS NOT NULL
        ),
        c AS (
            SELECT n,
                   n * sxx - CAST(sx AS HUGEINT) * sx AS cxx,
                   n * syy - CAST(sy AS HUGEINT) * sy AS cyy,
                   n * sxy - CAST(sx AS HUGEINT) * sy AS cxy
            FROM s
        )
        SELECT n AS n_pairs,
               CASE WHEN cxx = 0 THEN NULL
                    ELSE ROUND(CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE), 9)
               END AS gamma,
               CASE WHEN cxx = 0 OR n <= 2
                         OR CAST(cyy AS DOUBLE) / n
                            - (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
                              * (CAST(cxy AS DOUBLE) / n) <= 0.0 THEN NULL
                    ELSE ROUND(
                        (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
                        / SQRT(((CAST(cyy AS DOUBLE) / n
                            - (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
                              * (CAST(cxy AS DOUBLE) / n)) / (n - 2))
                            / (CAST(cxx AS DOUBLE) / (CAST(n AS DOUBLE) * n))),
                        6)
               END AS df_stat,
               CASE WHEN cxx = 0 OR n <= 2
                         OR CAST(cyy AS DOUBLE) / n
                            - (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
                              * (CAST(cxy AS DOUBLE) / n) <= 0.0 THEN NULL
                    WHEN (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
                        / SQRT(((CAST(cyy AS DOUBLE) / n
                            - (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
                              * (CAST(cxy AS DOUBLE) / n)) / (n - 2))
                            / (CAST(cxx AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
                        < -2.86 THEN 'stationary'
                    ELSE 'unit_root_not_rejected'
               END AS verdict
        FROM c
        WHERE n > 0
    """,
    doc="Dickey-Fuller unit-root test (drift form, lag 0) on daily "
    "revenue: regress the day-over-day CHANGE on the lagged level — "
    "gamma ~ 0 means shocks persist (random walk), gamma < 0 means "
    "mean reversion; DF = gamma/SE(gamma) against the -2.86 5% "
    "critical value (constant injected — the asymptotic DF "
    "distribution is tabulated, not computed). All moments exact "
    "128-bit integers from one LAG pass; SSE in the factored chow "
    "form; DF and the verdict derive from the SAME fixed float "
    "expression so the label can never disagree with the statistic. "
    "The unit-root complement of ts_variance_ratio (VR tests the "
    "walk's variance signature; DF its regression signature). Plan "
    "at 100 TB: one map-side-combinable daily agg + calendar-bounded "
    "LAG; constant algebra after.",
)
def ts_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    w = Window.orderBy("d")
    pairs = daily.select(
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("yl"),
    ).where("yl IS NOT NULL")
    s = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum("yl").cast("long").alias("sx"),
        F.sum(F.expr("CAST(dy AS DECIMAL(38,0)) * dy")).alias("syy"),
        F.sum(F.expr("CAST(yl AS DECIMAL(38,0)) * yl")).alias("sxx"),
        F.sum(F.expr("CAST(dy AS DECIMAL(38,0)) * yl")).alias("sxy"),
    )
    c = s.select(
        "n",
        F.expr("n * sxx - CAST(sx AS DECIMAL(38,0)) * sx").alias("cxx"),
        F.expr("n * syy - CAST(sy AS DECIMAL(38,0)) * sy").alias("cyy"),
        F.expr("n * sxy - CAST(sx AS DECIMAL(38,0)) * sy").alias("cxy"),
    )
    g = "(CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))"
    sse = f"(CAST(cyy AS DOUBLE) / n - {g} * (CAST(cxy AS DOUBLE) / n))"
    dfstat = (
        f"{g} / SQRT((({sse}) / (n - 2))"
        f" / (CAST(cxx AS DOUBLE) / (CAST(n AS DOUBLE) * n)))"
    )
    guard = f"cxx = 0 OR n <= 2 OR {sse} <= 0.0"
    return c.where("n > 0").select(
        F.col("n").alias("n_pairs"),
        F.expr(
            f"CASE WHEN cxx = 0 THEN NULL ELSE ROUND({g}, 9) END"
        ).alias("gamma"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL ELSE ROUND({dfstat}, 6) END"
        ).alias("df_stat"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            f" WHEN {dfstat} < -2.86 THEN 'stationary'"
            f" ELSE 'unit_root_not_rejected' END"
        ).alias("verdict"),
    )


@register(
    "ts_spectral_entropy",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   DATE_DIFF('day',
                             MIN(CAST(ts AS DATE)) OVER (),
                             CAST(ts AS DATE)) AS d,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        terms AS (
            SELECT daily.event_type, coeff.p,
                   SUM(CAST(daily.cnt AS HUGEINT) * coeff.c6) AS sc,
                   SUM(CAST(daily.cnt AS HUGEINT) * coeff.s6) AS ss
            FROM daily JOIN {_pgram_values_sql()}
              ON coeff.r = daily.d % coeff.p
            GROUP BY daily.event_type, coeff.p
        ),
        pw AS (
            SELECT event_type, p, sc * sc + ss * ss AS w,
                   SUM(sc * sc + ss * ss) OVER (PARTITION BY event_type)
                       AS tot
            FROM terms
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_periods,
               CAST(SUM(CASE WHEN w > 0 AND tot > 0 THEN
                    CAST(FLOOR(1000000.0
                        * (CAST(w AS DOUBLE) / CAST(tot AS DOUBLE))
                        * LN(CAST(tot AS DOUBLE) / CAST(w AS DOUBLE)))
                        AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS spec_entropy_ppm,
               CAST(MAX(CASE WHEN tot > 0 THEN w * 1000000 // tot
                        ELSE 0 END) AS BIGINT) AS dominance_ppm
        FROM pw
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Spectral entropy of the per-type daily-count periodogram — the "
    "forecastability score (H→0 one clean cycle, H→ln(9) white "
    "noise) over the SAME injected-coefficient DFT as "
    "ts_periodogram (which reports only the argmax; entropy says how "
    "concentrated the whole spectrum is): powers are exact 128-bit "
    "integers, each of the ≤9 entropy terms (w/W)·ln(W/w) is ONE "
    "fixed float expression FLOOR-quantized to ppm, summed as exact "
    "integers; dominance_ppm = max share in rule-13 integer ppm. "
    "Zero-power periods contribute exact zeros. Plan at 100 TB: the "
    "daily agg is the only data-scale stage; the 9-period fan-out "
    "and the entropy fold run on a 45-row bounded table.",
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "d",
            F.datediff(
                F.col("day"), F.min("day").over(Window.partitionBy())
            ),
        )
    )
    coeff = F.broadcast(
        spark.createDataFrame(_pgram_coeffs(), "p INT, r INT, c6 LONG, s6 LONG")
    )
    expl = daily.select(
        "event_type",
        "cnt",
        F.explode(F.array(*[F.lit(p) for p in PGRAM_PERIODS])).alias("p"),
        "d",
    ).withColumn("r", F.col("d") % F.col("p"))
    terms = (
        expl.join(coeff, ["p", "r"])
        .groupBy("event_type", "p")
        .agg(
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("c6")).alias("sc"),
            F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("s6")).alias("ss"),
        )
    )
    pw = terms.select(
        "event_type",
        "p",
        F.expr("sc * sc + ss * ss").alias("w"),
        F.expr(
            "SUM(sc * sc + ss * ss) OVER (PARTITION BY event_type)"
        ).alias("tot"),
    )
    return (
        pw.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_periods"),
            F.sum(
                F.expr(
                    "CASE WHEN w > 0 AND tot > 0 THEN"
                    " CAST(FLOOR(1000000.0"
                    " * (CAST(w AS DOUBLE) / CAST(tot AS DOUBLE))"
                    " * LN(CAST(tot AS DOUBLE) / CAST(w AS DOUBLE)))"
                    " AS BIGINT) ELSE 0 END"
                )
            )
            .cast("long")
            .alias("spec_entropy_ppm"),
            F.max(
                F.expr(
                    "CASE WHEN tot > 0 THEN CAST(w * 1000000 DIV tot"
                    " AS BIGINT) ELSE 0 END"
                )
            )
            .cast("long")
            .alias("dominance_ppm"),
        )
        .orderBy("event_type")
    )


def _bern_cusum_llr() -> tuple[int, int, int]:
    """Injected Bernoulli-CUSUM constants (the pgram discipline: no
    engine libm): ppm-quantized LLR steps for H1 p=0.55 vs H0 p=0.45
    and the ln(100) decision threshold."""
    import math

    l1 = int(math.floor(math.log(0.55 / 0.45) * 1_000_000))
    l0 = int(math.floor(math.log(0.45 / 0.55) * 1_000_000))
    h = int(math.floor(math.log(100.0) * 1_000_000))
    return l1, l0, h


_BC_L1, _BC_L0, _BC_H = _bern_cusum_llr()


@register(
    "ts_cusum_bernoulli",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                   CAST(SUM(CASE WHEN value > 35 THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        steps AS (
            SELECT d, x, n,
                   x * CAST({_BC_L1} AS BIGINT)
                   + (n - x) * CAST({_BC_L0} AS BIGINT) AS step_ppm
            FROM daily
        ),
        pfx AS (
            SELECT d, SUM(step_ppm) OVER (ORDER BY d) AS p
            FROM steps
        ),
        pfx2 AS (
            SELECT d, p,
                   MIN(p) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS runmin
            FROM pfx
        ),
        s AS (
            SELECT d, p - LEAST(runmin, 0) AS s_ppm
            FROM pfx2
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(MAX(s_ppm) AS BIGINT) AS max_s_ppm,
               CAST(SUM(CASE WHEN s_ppm >= {_BC_H} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alarm_days,
               CAST(MIN(CASE WHEN s_ppm >= {_BC_H}
                        THEN CAST(d AS VARCHAR) END) AS VARCHAR)
                   AS first_alarm_day
        FROM s
        HAVING COUNT(*) > 0
    """,
    doc="Bernoulli-LLR CUSUM for conversion-rate monitoring (Page 1954 "
    "SPC applied to the high-value purchase share): each day "
    "contributes the EXACT integer step x·L1 + (n-x)·L0 with the "
    "log-likelihood ratios ppm-quantized ONCE in Python and injected "
    "into both engines (the ts_periodogram no-libm rule), and the "
    "clamped recursion S_t = max(0, S_t-1 + step) is rewritten as "
    "the prefix-sum identity S_t = P_t - min(0, running-min P) — "
    "pure windows, no recursion, every value an exact integer. "
    "Alarm = S >= ln(100)·1e6 (ARL-tuned threshold injected); emits "
    "the alarm count and first alarm day (ISO string — pandas dtype "
    "parity). The RATE-monitoring sibling of ts_cusum_drift's "
    "per-user value CUSUM. Plan at 100 TB: one map-side-combinable "
    "daily agg; two windows over the CALENDAR-bounded grid.",
)
def ts_cusum_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(
        F.col("ts").cast("timestamp").cast("date").alias("d")
    ).agg(
        F.sum(F.when(F.col("value") > 35, 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.count("*").cast("long").alias("n"),
    )
    steps = daily.select(
        "d",
        (
            F.col("x") * F.lit(_BC_L1) + (F.col("n") - F.col("x")) * F.lit(_BC_L0)
        ).alias("step_ppm"),
    )
    w = Window.orderBy("d")
    pfx = steps.select(
        "d", F.sum("step_ppm").over(w).alias("p")
    ).select(
        "d",
        "p",
        F.min("p").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "runmin"
        ),
    )
    s = pfx.select(
        "d", (F.col("p") - F.least(F.col("runmin"), F.lit(0))).alias("s_ppm")
    )
    agg = s.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("s_ppm").cast("long").alias("max_s_ppm"),
        F.sum(F.expr(f"CASE WHEN s_ppm >= {_BC_H} THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_alarm_days"),
        F.min(
            F.when(
                F.col("s_ppm") >= _BC_H, F.col("d").cast("string")
            )
        ).alias("first_alarm_day"),
    )
    return agg.where("n_days > 0")


@register(
    "ts_sample_entropy",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(FLOOR(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        / 100000000.0) AS BIGINT) AS b
            FROM orders GROUP BY 1
        ),
        grams AS (
            SELECT b,
                   LEAD(b) OVER (ORDER BY d) AS b2
            FROM daily
        ),
        m1 AS (
            SELECT CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) AS bb
            FROM (SELECT b, COUNT(*) AS n FROM grams GROUP BY b) t
        ),
        m2 AS (
            SELECT CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) AS aa
            FROM (SELECT b, b2, COUNT(*) AS n FROM grams
                  WHERE b2 IS NOT NULL GROUP BY b, b2) t
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
               m1.bb AS template_matches_m1,
               m2.aa AS template_matches_m2,
               CASE WHEN m2.aa = 0 OR m1.bb = 0 THEN NULL
                    ELSE ROUND(-LN(CAST(m2.aa AS DOUBLE)
                               / CAST(m1.bb AS DOUBLE)), 6)
               END AS sampen
        FROM m1, m2
        WHERE (SELECT COUNT(*) FROM daily) > 0
    """,
    doc="Sample entropy (Richman-Moorman SampEn, m=1, binned-template "
    "contract) of the daily revenue series — the regularity/"
    "complexity score used in physiological and operational "
    "monitoring (low SampEn = repetitive dynamics, high = "
    "unpredictable): a 'match' is two days landing in the SAME "
    "1M-dollar-wide bin (the Chebyshev tolerance hardened into an "
    "equi-bin, making template counting a HISTOGRAM problem instead "
    "of an O(n²) scan — the cliff_delta discipline applied to "
    "template matching). B = Σn(n-1) over the 1-gram histogram, "
    "A = Σn(n-1) over the (bin, next-bin) 2-gram histogram (exact "
    "integers, self-matches excluded by the n(n-1) form), SampEn = "
    "-ln(A/B) with one LN; A or B = 0 emits NULL. Completes the "
    "complexity suite beside ts_hurst_rs (memory) and "
    "ts_spectral_entropy (frequency concentration). Plan at 100 TB: "
    "one daily hash agg, one LEAD, two bounded-histogram folds.",
)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.expr(
            "CAST(FLOOR(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))"
            " / 100000000.0) AS BIGINT)"
        ).alias("b")
    )
    grams = daily.select(
        "b", F.lead("b").over(Window.orderBy("d")).alias("b2")
    )
    grams = grams.localCheckpoint()  # calendar-bounded, read twice
    m1 = (
        grams.groupBy("b")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * (n - 1)"))
            .cast("long")
            .alias("bb")
        )
    )
    m2 = (
        grams.where("b2 IS NOT NULL")
        .groupBy("b", "b2")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * (n - 1)"))
            .cast("long")
            .alias("aa")
        )
    )
    nd = daily.agg(F.count("*").cast("long").alias("n_days"))
    return (
        nd.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m2))
        .where("n_days > 0")
        .select(
            "n_days",
            F.col("bb").alias("template_matches_m1"),
            F.col("aa").alias("template_matches_m2"),
            F.expr(
                "CASE WHEN aa = 0 OR bb = 0 THEN NULL"
                " ELSE ROUND(-LN(CAST(aa AS DOUBLE) / CAST(bb AS DOUBLE)),"
                " 6) END"
            ).alias("sampen"),
        )
    )


@register(
    "ts_intraday_uniformity",
    oracle="""
        WITH mins AS (
            SELECT CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) * 60
                        + EXTRACT(MINUTE FROM CAST(ts AS TIMESTAMP))
                        AS BIGINT) AS m
            FROM events
        ),
        hist AS (
            SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM mins GROUP BY m
        ),
        cum AS (
            SELECT m, SUM(c) OVER (ORDER BY m) AS cf,
                   SUM(c) OVER () AS n
            FROM hist
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_events,
               CAST(MAX(ABS(CAST(cf AS HUGEINT) * 1440
                            - CAST(n AS HUGEINT) * (m + 1)) * 1000000
                        // (CAST(n AS HUGEINT) * 1440)) AS BIGINT)
                   AS ks_d_ppm,
               CASE WHEN MAX(n) = 0 THEN NULL
                    ELSE ROUND(CAST(MAX(ABS(CAST(cf AS HUGEINT) * 1440
                              - CAST(n AS HUGEINT) * (m + 1)) * 1000000
                              // (CAST(n AS HUGEINT) * 1440)) AS DOUBLE)
                         / 1000000.0 * SQRT(CAST(MAX(n) AS DOUBLE)), 6)
               END AS kuiper_scaled
        FROM cum
        HAVING MAX(n) > 0
    """,
    doc="Intraday arrival-uniformity KS test: is traffic spread evenly "
    "across the 1440 minutes of the day, or does it clump? The "
    "one-sample KS distance against the uniform CDF — D = max_m "
    "|F_emp(m) - (m+1)/1440| — computed ENTIRELY in integers: the "
    "minute histogram's prefix sums cross-multiply against the "
    "uniform line (|cf·1440 - n·(m+1)| — rule-13, no float CDF), D "
    "in ppm and the sqrt(n)-scaled statistic for the asymptotic "
    "table. The arrival-PROCESS complement of agg_ks_test's value "
    "distribution test and agg_overdispersion's count test. Plan at "
    "100 TB: one map-side-combinable 1440-row histogram; the prefix "
    "window runs on the bounded minute grid.",
)
def ts_intraday_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    mins = e.select(
        (
            F.hour(F.col("ts").cast("timestamp")) * 60
            + F.minute(F.col("ts").cast("timestamp"))
        )
        .cast("long")
        .alias("m")
    )
    hist = mins.groupBy("m").agg(F.count("*").cast("long").alias("c"))
    cum = hist.select(
        "m",
        F.sum("c").over(Window.orderBy("m")).alias("cf"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    d = (
        "MAX(ABS(CAST(cf AS DECIMAL(38,0)) * 1440"
        " - CAST(n AS DECIMAL(38,0)) * (m + 1)) * 1000000"
        " DIV (CAST(n AS DECIMAL(38,0)) * 1440))"
    )
    agg = cum.agg(
        F.max("n").cast("long").alias("n_events"),
        F.expr(f"CAST({d} AS BIGINT)").alias("ks_d_ppm"),
    )
    return agg.where("n_events > 0").select(
        "n_events",
        "ks_d_ppm",
        F.expr(
            "CASE WHEN n_events = 0 THEN NULL"
            " ELSE ROUND(CAST(ks_d_ppm AS DOUBLE) / 1000000.0"
            " * SQRT(CAST(n_events AS DOUBLE)), 6) END"
        ).alias("kuiper_scaled"),
    )


#: Matrix-profile subsequence length (days). Pairs closer than W are
#: excluded as trivial matches, per the matrix-profile convention.
MP_WINDOW = 7


@register(
    "ts_matrix_profile",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT))
                        AS BIGINT) AS v
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        idx AS (
            SELECT day, v,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
            FROM daily
        ),
        vec AS (
            SELECT day, i,
                   {", ".join(
                       f"LEAD(v, {t}) OVER (ORDER BY i) AS v{t}"
                       for t in range(MP_WINDOW))}
            FROM idx
        ),
        valid AS (
            SELECT * FROM vec WHERE v{MP_WINDOW - 1} IS NOT NULL
        ),
        pairs AS (
            SELECT a.day, a.i,
                   MIN(({" + ".join(
                       f"CAST(a.v{t} - b.v{t} AS HUGEINT)"
                       f" * (a.v{t} - b.v{t})"
                       for t in range(MP_WINDOW))})
                       * 100000 + b.i) AS key
            FROM valid a JOIN valid b
              ON b.i >= a.i + {MP_WINDOW} OR b.i <= a.i - {MP_WINDOW}
            GROUP BY a.day, a.i
        )
        SELECT CAST(day AS TIMESTAMP) AS day, i AS idx,
               CAST(key // 100000 AS BIGINT) AS nn_dist2,
               CAST(key % 100000 AS BIGINT) AS nn_idx
        FROM pairs
    """,
    doc=f"Matrix profile (non-normalized, exact-integer) of the daily "
    f"purchase series — motif/anomaly discovery: for every "
    f"{MP_WINDOW}-day subsequence, the squared Euclidean distance to "
    f"its NEAREST non-overlapping neighbor and that neighbor's index. "
    f"A low profile value = a repeated motif (weekly pattern), a "
    f"spike = a discord (anomalous week) — the readout "
    f"ts_zscore_anomaly (pointwise) and ts_sax_words (symbolic) "
    f"cannot give: SHAPE similarity. Everything is exact: "
    f"milli-quantized daily sums, 128-bit squared distances, and the "
    f"argmin is decided by one integer key (dist*1e5 + j — "
    f"deterministic smallest-index tie-break, no engine-ordered "
    f"arg_min). Trivial matches (overlap < {MP_WINDOW} days apart) "
    f"are excluded per the matrix-profile convention. Plan at "
    f"100 TB: ONE map-side-combinable daily hash agg over the scan; "
    f"the {MP_WINDOW} LEADs, the O(days^2) pair triangle, and the "
    f"min-fold all run on the CALENDAR-bounded grid (~365 rows/yr "
    f"regardless of corpus size — the ts_isotonic_daily exemption "
    f"class).",
)
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(
        F.col("ts").cast("timestamp").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    wd = W.orderBy("day")
    idx = daily.select(
        "day", "v", F.row_number().over(wd).cast("long").alias("i")
    )
    wi = W.orderBy("i")
    vec = idx.select(
        "day",
        "i",
        *[
            F.lead("v", t).over(wi).alias(f"v{t}")
            for t in range(MP_WINDOW)
        ],
    )
    valid = vec.where(F.col(f"v{MP_WINDOW - 1}").isNotNull())
    valid = valid.localCheckpoint()  # calendar-bounded, read twice
    # The composite argmin key below encodes the neighbor index in the
    # low 5 decimal digits (dist * 100000 + j), so the day grid must
    # stay < 100000 rows or the decode silently corrupts on BOTH
    # engines (ADVICE r11 #4). ~274 years of daily data in practice;
    # check on the (already materialized) checkpoint rather than
    # leave the bound latent. ValueError, not assert: asserts are
    # stripped under ``python -O`` (ADVICE r12 #3 / the repo's own
    # round-6 multimodal-guard standard).
    n_days = valid.agg(F.max("i")).first()[0] or 0
    if n_days >= 100000:
        raise ValueError(
            f"ts_matrix_profile: {n_days} daily rows >= 1e5 breaks "
            f"the dist*100000+j argmin key encoding"
        )
    a, b = valid.alias("a"), valid.alias("b")
    dist = " + ".join(
        f"CAST(a.v{t} - b.v{t} AS DECIMAL(38,0)) * (a.v{t} - b.v{t})"
        for t in range(MP_WINDOW)
    )
    pairs = (
        a.join(
            b,
            (F.col("b.i") >= F.col("a.i") + MP_WINDOW)
            | (F.col("b.i") <= F.col("a.i") - MP_WINDOW),
        )
        .groupBy(F.col("a.day").alias("day"), F.col("a.i").alias("i"))
        .agg(F.min(F.expr(f"({dist}) * 100000 + b.i")).alias("key"))
    )
    return pairs.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("i").alias("idx"),
        F.expr("CAST(key DIV 100000 AS BIGINT)").alias("nn_dist2"),
        F.expr("CAST(key % 100000 AS BIGINT)").alias("nn_idx"),
    )


@register(
    "ts_classical_decompose",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                     AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        tr AS (
            SELECT day, v,
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN CAST(SUM(v) OVER w AS BIGINT) END AS trend7_sum,
                   CAST(((DATEDIFF('day', DATE '1970-01-05', day) % 7)
                         + 7) % 7
                        AS BIGINT) AS dow
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                         AND 3 FOLLOWING)
        ),
        dt AS (
            SELECT day, v, trend7_sum, dow,
                   CAST(7 * v - trend7_sum AS BIGINT) AS detr7
            FROM tr
        ),
        seas AS (
            SELECT dow, CAST(SUM(detr7) AS BIGINT) AS seas_num,
                   CAST(COUNT(detr7) AS BIGINT) AS seas_cnt
            FROM dt GROUP BY dow
        )
        SELECT CAST(d.day AS TIMESTAMP) AS day, d.v AS v_milli,
               d.trend7_sum, d.detr7, d.dow, s.seas_num, s.seas_cnt,
               CAST(d.detr7 * s.seas_cnt - s.seas_num AS BIGINT) AS resid_x
        FROM dt d JOIN seas s ON d.dow = s.dow
    """,
    doc="Classical additive seasonal decomposition of the daily purchase "
    "series — the trend / seasonal / residual readout that completes "
    "the seasonality family (ts_seasonal_strength scores it, "
    "ts_seasonality_profile averages it; this op emits the full "
    "decomposition ledger): trend = centered 7-observation moving "
    "window over the day grid (emitted as the exact SUM, NULL unless "
    "the window is full — no division), detrended = 7*v - trend7_sum "
    "(exact integers at 7x scale), seasonal = per-day-of-week mean of "
    "the detrended series emitted as (seas_num, seas_cnt), and the "
    "residual at combined scale resid_x = detr7*seas_cnt - seas_num — "
    "every column BIGINT, zero float accumulation, so the driver hash "
    "certifies the whole decomposition. Day-of-week comes from "
    "DATEDIFF against the 1970-01-05 Monday anchor (engine-neutral; "
    "DAYOFWEEK numbering differs across engines). Plan at 100 TB: ONE "
    "map-side-combinable hash agg collapses the scan to the "
    "CALENDAR-bounded day grid (~365 rows/yr at any corpus size — the "
    "ts_isotonic_daily exemption class); the centered window, the "
    "7-row seasonal agg, and the broadcast join back all run on that "
    "grid at constant cost.",
)
def ts_classical_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(
        F.col("ts").cast("timestamp").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "v",
        F.when(F.count("*").over(w) == 7, F.sum("v").over(w).cast("long"))
        .alias("trend7_sum"),
        F.pmod(
            F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")), F.lit(7)
        )
        .cast("long")
        .alias("dow"),
    )
    dt = tr.withColumn(
        "detr7", (F.lit(7) * F.col("v") - F.col("trend7_sum")).cast("long")
    ).localCheckpoint()  # calendar-bounded grid, read twice
    seas = dt.groupBy("dow").agg(
        F.sum("detr7").cast("long").alias("seas_num"),
        F.count("detr7").cast("long").alias("seas_cnt"),
    )
    return dt.join(F.broadcast(seas), "dow").select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("v").alias("v_milli"),
        "trend7_sum",
        "detr7",
        "dow",
        "seas_num",
        "seas_cnt",
        (F.col("detr7") * F.col("seas_cnt") - F.col("seas_num"))
        .cast("long")
        .alias("resid_x"),
    )


@register(
    "ts_theil_sen",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                     AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        idx AS (
            SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
            FROM daily
        ),
        pairs AS (
            SELECT CAST((b.v - a.v) * 1000 // (b.i - a.i) AS BIGINT) AS q
            FROM idx a JOIN idx b ON b.i > a.i
        ),
        grid AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY q),
        cum AS (
            SELECT q, SUM(c) OVER (ORDER BY q) AS cm, SUM(c) OVER () AS n
            FROM grid
        ),
        med AS (
            SELECT CAST(MIN(q) AS BIGINT) AS slope_q,
                   CAST(MAX(n) AS BIGINT) AS n_pairs
            FROM cum WHERE cm >= (n + 1) // 2
        ),
        res AS (
            SELECT CAST(1000 * idx.v - med.slope_q * idx.i AS BIGINT) AS r
            FROM idx, med
        ),
        rgrid AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS c FROM res GROUP BY r),
        rcum AS (
            SELECT r, SUM(c) OVER (ORDER BY r) AS cm, SUM(c) OVER () AS n
            FROM rgrid
        ),
        rmed AS (
            SELECT CAST(MIN(r) AS BIGINT) AS intercept_q,
                   CAST(MAX(n) AS BIGINT) AS n_days
            FROM rcum WHERE cm >= (n + 1) // 2
        )
        SELECT rmed.n_days, med.n_pairs, med.slope_q, rmed.intercept_q
        FROM med, rmed
    """,
    doc="Theil-Sen robust trend of the daily purchase series — the "
    "median of all pairwise slopes (29% breakdown point: a third of "
    "the days can be corrupted before the slope moves, where the OLS "
    "family (agg_ols2, ts_granger_lag1) follows every outlier) plus "
    "the matching median intercept, completing the robust-regression "
    "family (agg_deming_regression handles errors-in-both-variables, "
    "agg_huber_location_portable robust location; this is robust "
    "TREND). Exact arithmetic end to end: slopes are micro-units/day "
    "via (dv*1000) DIV di (both engines truncate identically, rule "
    "25), the median comes off the cumulative distinct-slope grid "
    "(the agg_mood_median lower-median convention, deterministic "
    "under ties), and the intercept is the median of 1000*v - "
    "slope_q*i offsets on the same grid machinery. Plan at 100 TB: "
    "ONE map-side-combinable hash agg collapses the scan to the "
    "CALENDAR-bounded day grid; the O(days^2) pair triangle "
    "(~66k pairs/yr regardless of corpus size — the "
    "ts_matrix_profile exemption class), both distinct-value-grid "
    "medians, and the 1-row folds are constant work above it.",
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(
        F.col("ts").cast("timestamp").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    idx = daily.select(
        "v",
        F.row_number().over(W.orderBy("day")).cast("long").alias("i"),
    ).localCheckpoint()  # calendar-bounded; read by pairs AND residuals
    a, b = idx.alias("a"), idx.alias("b")
    pairs = a.join(b, F.col("b.i") > F.col("a.i")).select(
        F.expr("CAST((b.v - a.v) * 1000 DIV (b.i - a.i) AS BIGINT)").alias(
            "q"
        )
    )
    grid = pairs.groupBy("q").agg(F.count("*").cast("long").alias("c"))
    w_cum = W.orderBy("q").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy()
    cum = grid.select(
        "q",
        F.sum("c").over(w_cum).alias("cm"),
        F.sum("c").over(w_all).alias("n"),
    )
    med = cum.where(F.expr("cm >= (n + 1) DIV 2")).agg(
        F.min("q").cast("long").alias("slope_q"),
        F.max("n").cast("long").alias("n_pairs"),
    )
    res = idx.crossJoin(F.broadcast(med)).select(
        F.expr("CAST(1000 * v - slope_q * i AS BIGINT)").alias("r")
    )
    rgrid = res.groupBy("r").agg(F.count("*").cast("long").alias("c"))
    rw_cum = W.orderBy("r").rowsBetween(W.unboundedPreceding, W.currentRow)
    rcum = rgrid.select(
        "r",
        F.sum("c").over(rw_cum).alias("cm"),
        F.sum("c").over(w_all).alias("n"),
    )
    rmed = rcum.where(F.expr("cm >= (n + 1) DIV 2")).agg(
        F.min("r").cast("long").alias("intercept_q"),
        F.max("n").cast("long").alias("n_days"),
    )
    return rmed.crossJoin(F.broadcast(med)).select(
        "n_days", "n_pairs", "slope_q", "intercept_q"
    )
