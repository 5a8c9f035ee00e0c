"""Range joins and as-of joins (temporal composites).

Declared target surface (SURVEY.md §2.2 ``join_range`` / ``join_asof``);
no Spark-native as-of operator exists, so both are compositions of
built-ins (SURVEY.md §4.2 flags this as composition, not a custom rule).

Scale notes:
  * ``join_range`` keeps an equi key in the join condition so Catalyst
    plans a sort-merge join with the band predicate as a post-join
    filter — never a nested-loop cross product.  For a *pure* band
    join (no equi key) the 100 TB strategy is binning: join on
    overlapping time buckets (equi) then filter to the exact band —
    registered as ``join_range_binned``.
  * ``join_asof`` uses the union + last(ignoreNulls) window pattern:
    tag both streams, union them (zero-shuffle concat), one window
    shuffle on (user_id) ordered by time — state per key is O(1),
    nothing quadratic, late/duplicate timestamps resolved by explicit
    tie-break.  This is the canonical scalable as-of (vs. range-join +
    rank-1 which re-materializes every candidate pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register


@register(
    "join_range",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(l.l_shipdate AS TIMESTAMP) AS l_shipdate,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               DATE_DIFF('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS ship_lag_days
        FROM lineitem l
        JOIN orders o
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    """,
    doc="Equi + band join: lineitems shipped within 60 days of their order date. "
    "Equi key keeps it sort-merge; band predicate is a join-condition filter.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    )
    return l.join(o, cond).select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "o_orderdate",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("ship_lag_days"),
    )


@register(
    "join_range_binned",
    oracle="""
        SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id, e.event_type,
               CAST(w.win_start AS TIMESTAMP) AS win_start
        FROM events e
        JOIN (
            SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS win_start,
                   CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) + INTERVAL 6 HOUR AS win_end
            FROM events WHERE event_type = 'error'
        ) w
          ON CAST(DATE_TRUNC('day', e.ts) AS TIMESTAMP) = w.win_start
         AND CAST(e.ts AS TIMESTAMP) >= w.win_start
         AND CAST(e.ts AS TIMESTAMP) <  w.win_end
        WHERE e.event_type = 'purchase'
    """,
    doc="Pure band join made scalable by binning: derive day-bucket windows, join on the "
    "bucket (equi) and filter to the exact range — the 100 TB replacement for a "
    "nested-loop interval join. (Windows spanning bin boundaries would join on an "
    "exploded bucket list; these are single-bin by construction.)",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    wins = (
        e.where(F.col("event_type") == "error")
        .select(F.date_trunc("day", "ts").alias("win_start"))
        .distinct()
        .withColumn("win_end", F.col("win_start") + F.expr("INTERVAL 6 HOURS"))
    )
    purchases = e.where(F.col("event_type") == "purchase")
    return (
        purchases.withColumn("bin", F.date_trunc("day", "ts"))
        .join(
            F.broadcast(wins),
            (F.col("bin") == F.col("win_start"))
            & (F.col("ts") >= F.col("win_start"))
            & (F.col("ts") < F.col("win_end")),
        )
        .select("event_id", "ts", "user_id", "event_type", "win_start")
    )


@register(
    "join_asof",
    oracle="""
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
               (SELECT MAX(CAST(v.ts AS TIMESTAMP)) FROM events v
                WHERE v.event_type = 'view' AND v.user_id = p.user_id
                  AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)) AS last_view_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
    doc="As-of join: for each purchase, the latest prior 'view' by the same user. "
    "Spark plan: tag+union both streams, one window per user ordered by (ts, tag, "
    "event_id), last(ignoreNulls) carry-forward — O(1) state per key, no candidate "
    "pair materialization (the scalable as-of; cf. SURVEY.md §7 stage 3).",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"), F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("view_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("is_purchase"),
        "event_id", "value",
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    # Order views before purchases at identical ts so "<= ts" semantics hold.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        views.unionByName(purchases)
        .withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
        .where(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "ts", "value", "last_view_ts")
    )


@register(
    "join_interval_overlap",
    # Sampled key set (o_orderkey % 50 = 0) keeps the PAIR count bounded
    # in the fixture; the bin-join plan below is what bounds it at scale.
    oracle="""
        WITH iv AS (
            SELECT o_orderkey AS k, o_orderpriority AS prio,
                   CAST(o_orderdate AS DATE) AS s,
                   CAST(o_orderdate AS DATE)
                       + CAST((o_orderkey % 7 + 1) AS INT) AS e
            FROM orders
            WHERE o_orderkey % 50 = 0
        )
        SELECT a.k AS a_key, b.k AS b_key, a.prio AS prio,
               CAST(DATE_DIFF('day',
                              GREATEST(a.s, b.s),
                              LEAST(a.e, b.e)) + 1 AS BIGINT) AS overlap_days
        FROM iv a JOIN iv b
          ON a.prio = b.prio AND a.k < b.k
         AND a.s <= b.e AND b.s <= a.e
    """,
    doc="Interval-overlap self-join ([s,e] ranges that intersect, per "
    "priority group) — the genomics/outage/session-overlap shape that a "
    "naive formulation makes quadratic. Scale plan: each interval is "
    "EXPLODED into the week bins it covers (intervals are <=8 days, so "
    "<=3 bins — bounded fan-out), candidates come from an equi join on "
    "(priority, week_bin), the exact overlap predicate filters, and "
    "DISTINCT collapses pairs that met in several bins. The shuffle key "
    "is (prio, bin), candidates are per-bin local, and nothing quadratic "
    "exists at any scale — the same binning as join_range_binned, "
    "extended to interval×interval. The oracle states the overlap "
    "predicate directly (quadratic is fine at oracle scale).",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 7 + 1).cast("int"),
        ).alias("e"),
    )
    # epoch-week bins (floor(days-since-epoch / 7)): plain integer
    # arithmetic with no ISO-week year-boundary seam — weekofyear-based
    # bins would put Dec 31 and Jan 2 in non-adjacent bins and silently
    # drop an overlapping pair.
    epoch = F.lit("1970-01-01").cast("date")
    binned = iv.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col("s"), epoch) / 7),
                F.floor(F.datediff(F.col("e"), epoch) / 7),
            )
        ).alias("wbin"),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.prio") == F.col("b.prio"))
            & (F.col("a.wbin") == F.col("b.wbin"))
            & (F.col("a.k") < F.col("b.k"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.k").alias("a_key"),
            F.col("b.k").alias("b_key"),
            F.col("a.prio").alias("prio"),
            (
                F.datediff(
                    F.least(F.col("a.e"), F.col("b.e")),
                    F.greatest(F.col("a.s"), F.col("b.s")),
                )
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
        .distinct()
    )
    return pairs


ASOF_TOL_US = 3_600_000_000  # nearest-match tolerance: 1 hour, in microseconds


@register(
    "join_asof_nearest",
    # Gaps are compared in exact integer MICROSECONDS (timestampdiff /
    # DATE_DIFF) — the fixtures carry microsecond timestamps, and a
    # seconds-truncating diff could flip the nearest decision between
    # engines. Ties (equidistant prev/next) resolve backward.
    oracle=f"""
        WITH p AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   (SELECT MAX(CAST(v.ts AS TIMESTAMP)) FROM events v
                    WHERE v.event_type = 'view' AND v.user_id = p0.user_id
                      AND CAST(v.ts AS TIMESTAMP) <= CAST(p0.ts AS TIMESTAMP))
                       AS prev_ts,
                   (SELECT MIN(CAST(v.ts AS TIMESTAMP)) FROM events v
                    WHERE v.event_type = 'view' AND v.user_id = p0.user_id
                      AND CAST(v.ts AS TIMESTAMP) >= CAST(p0.ts AS TIMESTAMP))
                       AS next_ts
            FROM events p0
            WHERE event_type = 'purchase'
        ),
        g AS (
            SELECT *,
                   DATE_DIFF('microsecond', prev_ts, ts) AS gap_back,
                   DATE_DIFF('microsecond', ts, next_ts) AS gap_fwd
            FROM p
        )
        SELECT event_id, user_id, ts, value,
               CASE WHEN prev_ts IS NOT NULL AND gap_back <= {ASOF_TOL_US}
                         AND (next_ts IS NULL OR gap_fwd > {ASOF_TOL_US}
                              OR gap_back <= gap_fwd)
                    THEN prev_ts
                    WHEN next_ts IS NOT NULL AND gap_fwd <= {ASOF_TOL_US}
                    THEN next_ts
               END AS nearest_view_ts,
               CASE WHEN prev_ts IS NOT NULL AND gap_back <= {ASOF_TOL_US}
                         AND (next_ts IS NULL OR gap_fwd > {ASOF_TOL_US}
                              OR gap_back <= gap_fwd)
                    THEN CAST(gap_back AS BIGINT)
                    WHEN next_ts IS NOT NULL AND gap_fwd <= {ASOF_TOL_US}
                    THEN CAST(gap_fwd AS BIGINT)
               END AS gap_us
        FROM g
    """,
    doc=f"NEAREST-match as-of join (pandas merge_asof direction='nearest' "
    f"with tolerance): each purchase matches its closest 'view' by the "
    f"same user in EITHER direction, within 1 hour, ties resolving "
    f"backward — sensor/quote alignment semantics that backward-only "
    f"join_asof cannot express. Plan: the same tag+union stream, ONE "
    f"user_id exchange, two window passes over it (carry-forward last "
    f"view and carry-backward first view — the equal-ts tie order flips "
    f"between passes so a view at exactly the purchase time is visible "
    f"to both), then a narrow arbitration on exact integer microsecond "
    f"gaps. O(1) window state per key, no candidate pairs — the same "
    f"100 TB shape as join_asof.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("view_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        "event_id",
        "value",
        F.lit(None).cast(views.schema["view_ts"].dataType).alias("view_ts"),
    )
    u = views.unionByName(purchases)
    # backward: views sort BEFORE purchases at equal ts (<= semantics)
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: purchases sort BEFORE views at equal ts (>= semantics)
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_purchase").desc(), "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    g = (
        u.withColumn("prev_ts", F.last("view_ts", ignorenulls=True).over(w_back))
        .withColumn("next_ts", F.first("view_ts", ignorenulls=True).over(w_fwd))
        .where(F.col("is_purchase") == 1)
        .withColumn(
            "gap_back", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
        )
        .withColumn("gap_fwd", F.expr("timestampdiff(MICROSECOND, ts, next_ts)"))
    )
    pick_back = (
        F.col("prev_ts").isNotNull()
        & (F.col("gap_back") <= ASOF_TOL_US)
        & (
            F.col("next_ts").isNull()
            | (F.col("gap_fwd") > ASOF_TOL_US)
            | (F.col("gap_back") <= F.col("gap_fwd"))
        )
    )
    pick_fwd = F.col("next_ts").isNotNull() & (F.col("gap_fwd") <= ASOF_TOL_US)
    return g.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(pick_back, F.col("prev_ts"))
        .when(pick_fwd, F.col("next_ts"))
        .alias("nearest_view_ts"),
        F.when(pick_back, F.col("gap_back").cast("long"))
        .when(pick_fwd, F.col("gap_fwd").cast("long"))
        .alias("gap_us"),
    )


ASOF_TOLERANCE_MIN = 60  # max lookback for a match (minutes)


@register(
    "join_asof_tolerance",
    oracle=f"""
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
               (SELECT MAX(CAST(v.ts AS TIMESTAMP)) FROM events v
                WHERE v.event_type = 'view' AND v.user_id = p.user_id
                  AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
                  AND CAST(v.ts AS TIMESTAMP)
                      >= CAST(p.ts AS TIMESTAMP)
                         - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE)
                   AS last_view_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
    doc=f"As-of join with a TOLERANCE bound (pandas merge_asof's "
    f"tolerance= semantics): each purchase matches its latest prior "
    f"view only if it happened within {ASOF_TOLERANCE_MIN} minutes — "
    f"stale context is worse than none for attribution and feature "
    f"freshness, so the match NULLs out beyond the horizon. Same "
    f"tag+union single-window plan as join_asof (one shuffle per "
    f"user, O(1) carried state), with the tolerance applied AFTER "
    f"the carry-forward as a null-out comparison — the window itself "
    f"is unchanged, so the cost envelope is identical and state "
    f"never grows with the horizon.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("view_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("is_purchase"),
        "event_id", "value",
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        views.unionByName(purchases)
        .withColumn("last_any", F.last("view_ts", ignorenulls=True).over(w))
        .where(F.col("is_purchase") == 1)
    )
    within = F.col("last_any") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTE"
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(within, F.col("last_any")).alias("last_view_ts"),
    )
