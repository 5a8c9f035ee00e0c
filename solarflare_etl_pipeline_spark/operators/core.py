"""Core scan / project / filter / sort operators + the flagship query.

Reference anchors (SURVEY.md §2.1): R1 typed source, R4 projection+rename
(``/root/reference/dags/etl.py:48-64``), R5 null-tolerant access, R6 type
coercion, R7 keyed dedup (``/root/reference/dags/etl.py:66-89``).

Scale notes: every query here is a narrow scan→project→filter pipeline
(zero or one shuffle).  Filters and projections are written on base
columns so Catalyst pushes them into the Parquet scan (check
``PushedFilters`` / ``ReadSchema`` in ``df.explain("formatted")``) —
at 100 TB that is the difference between scanning 10 TB and 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.functions.numeric import dsum, sql_dsum
from solarflare_etl_pipeline_spark.registry import register


@register(
    "scan_parquet",
    oracle="SELECT * FROM part",
    doc="Typed table scan straight off the parquet footer schema.",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part")


@register(
    "project_rename",
    oracle="""
        SELECT event_id AS id,
               event_type AS kind,
               CAST(ts AS TIMESTAMP) AS event_ts,
               value AS score
        FROM events
    """,
    doc="Projection + rename (reference R4: camelCase→snake_case, 8-of-15 fields).",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("kind"),
        F.col("ts").alias("event_ts"),
        F.col("value").alias("score"),
    )


@register(
    "filter_pred",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE (event_type = 'purchase' AND value > 100.0)
           OR (event_type = 'error' AND value <= 50.0)
           OR user_id IS NULL
    """,
    doc="Compound predicate with explicit NULL branch (reference R5 null tolerance).",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    pred = (
        ((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        | ((F.col("event_type") == "error") & (F.col("value") <= 50.0))
        | F.col("user_id").isNull()
    )
    return e.where(pred).select("event_id", "user_id", "event_type", "value")


@register(
    "sort_limit",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc="Total sort + limit; unique tie-break key keeps the top-100 set deterministic. "
    "Physically a TakeOrderedAndProject — per-partition top-k then driver merge, no full sort at scale.",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "flagship_daily_events",
    oracle=f"""
        WITH deduped AS (
            SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
            FROM events
        )
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               {sql_dsum('value', 'total_value')}
        FROM deduped
        WHERE rn = 1
        GROUP BY 1, 2
    """,
    doc="Flagship: the reference ETL re-expressed (ingest→project→dedup-by-key→daily rollup); "
    "reference semantics of dags/etl.py:36-89 as one lazy Spark plan.",
)
def flagship_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # First-wins keyed dedup (reference R7: ON CONFLICT DO NOTHING) made
    # deterministic: rank within key by (ts, user_id) and keep rank 1.
    w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    deduped = e.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        deduped.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "total_value"),
        )
    )


@register(
    "sample_hash_split",
    oracle="""
        SELECT doc_id,
               CASE WHEN CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10 < 8
                        THEN 'train'
                    WHEN CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10 < 9
                        THEN 'val'
                    ELSE 'test' END AS split,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens
        FROM documents
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by key hash (md5 of the "
    "document key, first 16 bits mod 10) — reproducible at any parallelism and "
    "across reruns, unlike rand()-based sampling; membership is a pure function "
    "of the key, so late-arriving rows land in a stable split and the assignment "
    "never shuffles (narrow map). The split column is the partition key a "
    "training exporter writes by.",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int") % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    )
    return d.select(
        "doc_id",
        split.alias("split"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


@register(
    "sample_stratified",
    oracle="""
        SELECT doc_id, lang, source
        FROM (
            SELECT doc_id, lang, source,
                   CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
                       AS bucket,
                   CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25 ELSE 10 END AS rate
            FROM documents
        )
        WHERE bucket < rate
    """,
    doc="Deterministic stratified sampling: per-stratum (lang) keep-rates applied "
    "by key-hash bucket (md5 of doc_id, first 16 bits mod 100) — en 50%, de 25%, "
    "rest 10%. Same reproducibility argument as sample_hash_split (membership is "
    "a pure function of the key: stable across reruns, parallelism, and late "
    "data), unlike df.sampleBy whose Bernoulli draw is seed- and "
    "partitioning-dependent. Narrow map + filter: no shuffle at any scale; "
    "down-weighting over-represented strata is the standard corpus-mix lever.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("int") % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 50).when(F.col("lang") == "de", 25).otherwise(10)
    )
    return d.where(bucket < rate).select("doc_id", "lang", "source")


@register(
    "scan_observed",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice', 'total_price')}
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Aggregation with in-flight data-quality observation: df.observe attaches "
    "a CollectMetrics node (row count + violation count for price<=0) that rides "
    "the same scan — zero extra passes, metrics delivered with the action. The "
    "production pattern for row-level quality monitoring at 100 TB, where a "
    "separate validation query would double the scan cost. Metric delivery is "
    "asserted in tests/test_semantics.py.",
)
def scan_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    obs = Observation()
    o = table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count_if(F.col("o_totalprice") <= 0).alias("bad_price_rows"),
    )
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice", "total_price")
    )


@register(
    "sample_shuffle_order",
    oracle="""
        SELECT doc_id,
               CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                   % 8 AS shard_id,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4))
                                    AS INTEGER) % 8
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS shuffle_rank
        FROM documents
    """,
    doc="Deterministic sharded corpus shuffle - the training-order "
    "randomization pass: every example is routed to one of 8 shards by key "
    "hash (sample_hash_split's proven md5 arithmetic) and ordered WITHIN its "
    "shard by the full digest - reproducible at any parallelism and across "
    "reruns (rand() is neither) and uncorrelated with ingest order. A "
    "training job reads shards round-robin for an unbiased mix. The window "
    "is PARTITIONED by shard (one ordinary hash shuffle; contrast a global "
    "ORDER BY rank, which serializes the corpus through one partition - the "
    "win_share/ngram_freq lesson); at 100 TB raise the shard count to the "
    "writer parallelism and each shard becomes one exported file.",
)
def sample_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    digest = F.md5(F.col("doc_id").cast("string"))
    shard = (
        F.conv(F.substring(digest, 1, 4), 16, 10).cast("int") % 8
    )
    w = Window.partitionBy(shard).orderBy(digest, "doc_id")
    return d.select(
        "doc_id",
        shard.alias("shard_id"),
        F.row_number().over(w).alias("shuffle_rank"),
    )


@register(
    "dq_expectations",
    oracle="""
        SELECT 'orders_pk_unique' AS rule,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations,
               COUNT(*) = COUNT(DISTINCT o_orderkey) AS passed
        FROM orders
        UNION ALL
        SELECT 'lineitem_fk_orders' AS rule,
               COUNT(*) AS n_violations,
               COUNT(*) = 0 AS passed
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'orders_price_positive' AS rule,
               COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS n_violations,
               COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'orders_date_not_null' AS rule,
               COUNT(*) - COUNT(o_orderdate) AS n_violations,
               COUNT(*) - COUNT(o_orderdate) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'lineitem_qty_range' AS rule,
               COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
                   AS n_violations,
               COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) = 0
                   AS passed
        FROM lineitem
    """,
    doc="Declarative data-quality expectations — the contract-validation pass "
    "(DLT expectations / Great Expectations shape) a pipeline runs before "
    "publishing a dataset: primary-key uniqueness, referential integrity "
    "(orphaned lineitem FKs via anti semi-join), non-negativity, "
    "non-null, and value-range rules, one result row per rule with a "
    "violation count and verdict. Each rule is a single aggregate over its "
    "table (the FK rule one anti join); all five union into one plan so "
    "shared scans dedupe under reuse. Complements scan_observed (in-flight "
    "metrics riding a production query) with the standalone audit form.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")

    def rule(name, viol):
        return F.lit(name).alias("rule"), viol.alias("n_violations"), (
            viol == 0
        ).alias("passed")

    pk = o.agg(*rule("orders_pk_unique", F.count("*") - F.countDistinct("o_orderkey")))
    fk_orphans = (
        l.join(o.select("o_orderkey"), l["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(*rule("lineitem_fk_orders", F.count("*")))
    )
    price = o.agg(
        *rule("orders_price_positive", F.count_if(F.col("o_totalprice") <= 0))
    )
    notnull = o.agg(
        *rule("orders_date_not_null", F.count("*") - F.count("o_orderdate"))
    )
    qty = l.agg(
        *rule(
            "lineitem_qty_range",
            F.count_if((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        )
    )
    return pk.unionAll(fk_orphans).unionAll(price).unionAll(notnull).unionAll(qty)


@register(
    "dq_volume_anomaly",
    # Day-over-day volume drift as integer ppm (rule 16: no float ratios
    # in the hash); the first day has no predecessor -> NULL delta.
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS TIMESTAMP)
                       AS event_date,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY 1
        )
        SELECT event_date, n_events,
               LAG(n_events) OVER (ORDER BY event_date) AS prev_events,
               CAST(FLOOR((n_events - LAG(n_events) OVER (ORDER BY event_date))
                          * 1000000.0
                          / LAG(n_events) OVER (ORDER BY event_date)) AS BIGINT)
                   AS delta_ppm,
               COALESCE(ABS(CAST(FLOOR((n_events
                                        - LAG(n_events) OVER (ORDER BY event_date))
                                       * 1000000.0
                                       / LAG(n_events) OVER (ORDER BY event_date))
                                 AS BIGINT))
                        > 300000, FALSE) AS is_anomaly
        FROM daily
    """,
    doc="Volume-anomaly monitor — the first data-quality alarm every daily "
    "pipeline wires (the reference's daily cadence, dags/etl.py:12, with "
    "no volume check means a silent upstream outage ships an empty day): "
    "per-day counts, day-over-day delta in integer parts-per-million "
    "(floor division — no float rounding in the hash, rule 16), and a "
    "+/-30% anomaly flag. The daily rollup is one hash aggregate; the lag "
    "window runs over calendar-sized rows (days, not events) so the "
    "single-partition window is ~365 rows/year at ANY raw scale — the "
    "one case where an unpartitioned window is correct.",
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("timestamp").alias("event_date")
    ).agg(F.count("*").alias("n_events"))
    w = Window.orderBy("event_date")
    prev = F.lag("n_events").over(w)
    delta_ppm = F.floor((F.col("n_events") - prev) * 1000000 / prev).cast("long")
    return daily.select(
        "event_date",
        "n_events",
        prev.alias("prev_events"),
        delta_ppm.alias("delta_ppm"),
        F.coalesce(F.abs(delta_ppm) > 300000, F.lit(False)).alias("is_anomaly"),
    )


@register(
    "sample_quality_weighted",
    # Keep probability is a pure function of the quality tier:
    # high-diversity docs keep 1000/1000, mid 500/1000, low 100/1000 —
    # and membership is a pure function of (doc_id, tier), so the SAME
    # docs are kept at any parallelism, on any rerun, and when the
    # corpus grows (late docs don't reshuffle earlier keeps).
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
                   CASE WHEN CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
                             / LEN(STRING_SPLIT(text, ' ')) > 0.5 THEN 'high'
                        WHEN CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
                             / LEN(STRING_SPLIT(text, ' ')) > 0.3 THEN 'mid'
                        ELSE 'low' END AS tier
            FROM documents
        )
        SELECT doc_id, lang, n_tokens, tier
        FROM scored
        WHERE CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
              % 1000
              < CASE tier WHEN 'high' THEN 1000 WHEN 'mid' THEN 500 ELSE 100 END
    """,
    doc="Quality-weighted deterministic downsampling — the corpus-mixing "
    "step between scoring and training (keep all high-quality text, half "
    "the mid tier, a tenth of the low tier — the upsample/downsample "
    "mixture every pre-training data recipe specifies): the keep decision "
    "compares the key's md5 bucket (sample_hash_split's portable hash) "
    "against a per-tier threshold, so sampling is reproducible at any "
    "parallelism and stable as the corpus grows — rand() gives neither. "
    "Narrow map end-to-end (score, tier, hash, filter fuse into the scan "
    "stage); at 100 TB this runs at scan speed and composes with "
    "flagship_training_corpus's per-(split, lang) budgeting.",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    diversity = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    tier = (
        F.when(diversity > 0.5, "high").when(diversity > 0.3, "mid").otherwise("low")
    )
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 1000
    threshold = (
        F.when(F.col("tier") == "high", 1000)
        .when(F.col("tier") == "mid", 500)
        .otherwise(100)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(toks).alias("n_tokens"),
            tier.alias("tier"),
        )
        .where(bucket < threshold)
    )


@register(
    "sample_reservoir_per_group",
    oracle="""
        SELECT doc_id, lang, rk
        FROM (
            SELECT doc_id, lang,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS rk
            FROM documents
        ) WHERE rk <= 20
    """,
    doc="Exact-quota per-group sampling (a deterministic 'reservoir' of "
    "k=20 docs per language): rows ranked inside each stratum by the md5 "
    "of their key — a uniform, data-independent order — and the first k "
    "kept. Complements rate-based sample_stratified when the recipe says "
    "'exactly k per group' (eval-set carving, per-language probes): "
    "membership is a pure function of the key set, reproducible across "
    "reruns, parallelism, and input order, unlike reservoir algorithms "
    "seeded per partition. Plan: one hash shuffle on lang for the "
    "window; at 100 TB, replace the full sort with a per-partition "
    "top-k + merge (rank-then-filter already lets Spark push the limit "
    "via WindowGroupLimit) — the pushed form ships only k rows per "
    "(partition, group) to the exchange.",
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("long").alias("rk"))
        .where(F.col("rk") <= 20)
    )


@register(
    "dq_histogram_drift",
    oracle="""
        WITH q AS (
            SELECT event_type,
                   EPOCH_US(CAST(ts AS TIMESTAMP)) AS us,
                   CAST(FLOOR(value * 1000) AS BIGINT) // 50000 AS bin
            FROM events
        ),
        mid AS (
            SELECT MIN(us) + (MAX(us) - MIN(us)) // 2 AS cut FROM q
        ),
        c AS (
            SELECT event_type, us < (SELECT cut FROM mid) AS early, bin,
                   COUNT(*) AS n
            FROM q GROUP BY 1, 2, 3
        ),
        t AS (
            SELECT event_type, early, CAST(SUM(n) AS BIGINT) AS tot
            FROM c GROUP BY 1, 2
        ),
        p AS (
            SELECT c.event_type, c.bin,
                   CAST(SUM(CASE WHEN c.early THEN c.n * 1000000 // t.tot
                            ELSE 0 END) AS BIGINT) AS p_early_ppm,
                   CAST(SUM(CASE WHEN NOT c.early THEN c.n * 1000000 // t.tot
                            ELSE 0 END) AS BIGINT) AS p_late_ppm
            FROM c JOIN t ON c.event_type = t.event_type AND c.early = t.early
            GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(SUM(ABS(p_early_ppm - p_late_ppm)) AS BIGINT)
                   AS l1_drift_ppm,
               COUNT(*) AS n_bins
        FROM p GROUP BY 1
    """,
    doc="Distribution-drift monitor (the PSI/KS sibling every feature "
    "store runs nightly): per event type, the value distribution of the "
    "stream's FIRST time half is compared against its SECOND half — "
    "fixed-width value bins, per-epoch bin shares in integer ppm, drift "
    "reported as the L1 distance sum|p_early - p_late| (total-variation "
    "x2, monotone in PSI for fixed bins and — unlike PSI — log-free, so "
    "exact in BIGINT; the rule-22 discipline). The epoch cut is the "
    "integer midpoint of the observed epoch-microsecond range (unix_"
    "micros ≡ EPOCH_US), a pure function of the data. Plan: one hash "
    "agg to (type, epoch, bin) grains — constant-sized — then windowless "
    "small joins; the only data-sized stage is the first scan+agg, at "
    "100 TB pruned by partition columns when halves are calendar "
    "partitions.",
)
def dq_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        # ts is TIMESTAMP_NTZ; cast via the UTC-pinned session so
        # unix_micros matches DuckDB's EPOCH_US on the naive value
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT) DIV 50000").alias("bin"),
    )
    mid = q.agg(
        (F.min("us") + F.expr("(MAX(us) - MIN(us)) DIV 2")).alias("cut")
    )
    c = (
        q.join(F.broadcast(mid))
        .select("event_type", (F.col("us") < F.col("cut")).alias("early"), "bin")
        .groupBy("event_type", "early", "bin")
        .agg(F.count("*").alias("n"))
    )
    t = c.groupBy("event_type", "early").agg(F.sum("n").alias("tot"))
    p = (
        c.join(t, ["event_type", "early"])
        .groupBy("event_type", "bin")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN early THEN n * 1000000 DIV tot ELSE 0 END) AS BIGINT)"
            ).alias("p_early_ppm"),
            F.expr(
                "CAST(SUM(CASE WHEN NOT early THEN n * 1000000 DIV tot ELSE 0 END) AS BIGINT)"
            ).alias("p_late_ppm"),
        )
    )
    return p.groupBy("event_type").agg(
        F.expr("CAST(SUM(ABS(p_early_ppm - p_late_ppm)) AS BIGINT)").alias(
            "l1_drift_ppm"
        ),
        F.count("*").alias("n_bins"),
    )


@register(
    "dq_column_profile",
    oracle="""
        SELECT 'event_type' AS col_name,
               CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct
        FROM events
        UNION ALL
        SELECT 'user_id',
               CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
               CAST(COUNT(DISTINCT user_id) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'value',
               CAST(COUNT(*) - COUNT(value) AS BIGINT),
               CAST(COUNT(DISTINCT value) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'props',
               CAST(COUNT(*) - COUNT(props) AS BIGINT),
               CAST(COUNT(DISTINCT props) AS BIGINT)
        FROM events
    """,
    doc="Column-level data profiling (the null/cardinality report every "
    "catalog and data-contract check publishes): per column, exact null "
    "count and exact distinct count, emitted as one (col_name, n_nulls, "
    "n_distinct) row per column. Computed in a SINGLE aggregate pass "
    "over the table (one COUNT + one COUNT(col) + one COUNT(DISTINCT) "
    "per column in the same agg, then unpivoted with stack) — one scan, "
    "one shuffle, versus the naive per-column scan loop. At 100 TB swap "
    "the exact distincts for approx_count_distinct per column (see "
    "agg_approx_distinct_bounds for the sketch-accuracy gate) and the "
    "pass is identical; the profile table is |columns|-sized.",
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    agg = e.agg(
        F.count("*").alias("n"),
        F.count("event_type").alias("c_event_type"),
        F.countDistinct("event_type").alias("d_event_type"),
        F.count("user_id").alias("c_user_id"),
        F.countDistinct("user_id").alias("d_user_id"),
        F.count("value").alias("c_value"),
        F.countDistinct("value").alias("d_value"),
        F.count("props").alias("c_props"),
        F.countDistinct("props").alias("d_props"),
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " 'event_type', n - c_event_type, d_event_type,"
            " 'user_id',    n - c_user_id,    d_user_id,"
            " 'value',      n - c_value,      d_value,"
            " 'props',      n - c_props,      d_props"
            ") AS (col_name, n_nulls, n_distinct)"
        )
    )


@register(
    "dq_qq_drift",
    oracle="""
        WITH q AS (
            SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP'2024-01-16'
                        THEN 'w1' ELSE 'w2' END AS epoch,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        ranked AS (
            SELECT epoch, v3,
                   CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY v3)
                        AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY epoch) AS BIGINT) AS n
            FROM q
        ),
        oct AS (
            SELECT epoch, k, MAX(v3) AS qv
            FROM ranked, UNNEST([1, 2, 3, 4, 5, 6, 7]) AS t(k)
            WHERE rn * 8 <= n * k
            GROUP BY epoch, k
        )
        SELECT CAST(a.k AS INT) AS octile,
               a.qv AS w1_value, b.qv AS w2_value,
               CAST(b.qv - a.qv AS BIGINT) AS drift
        FROM oct a JOIN oct b ON a.k = b.k
        WHERE a.epoch = 'w1' AND b.epoch = 'w2'
    """,
    doc="Quantile-quantile distribution drift — the DQ monitor that "
    "catches SHAPE changes dq_histogram_drift's fixed bins blur and "
    "dq_volume_anomaly (counts) cannot see at all: the two epochs' "
    "empirical octiles side by side with their signed drift. "
    "Quantiles are EXACT ORDER STATISTICS (largest value whose rank "
    "satisfies rn*8 <= n*k — pure BIGINT rank arithmetic, no "
    "interpolation, no division), so the result is hash-exact with "
    "zero float ops. Epoch split at the fixture's mid-month; "
    "production parameterizes the cut. Plan (r7 rewrite — the oracle's "
    "epoch-partitioned rank window over RAW rows would be two single-"
    "task sorts at scale): the rank never needed per-row assignment — "
    "value-at-rank-t over a sorted multiset is a cumulative-histogram "
    "lookup, so the Spark side aggregates to the DISTINCT-VALUE grid "
    "first (groupBy(epoch, v3).count(), map-side combinable; grid size "
    "is bounded by the x1000 discretization, NOT by row count — the "
    "agg_ks_test discipline), cumulates over that bounded grid, and "
    "reads octile k as MIN v3 with cum >= (n*k) DIV 8 — provably the "
    "same value the oracle's MAX-under-rank form selects. 7x explode "
    "on the grid only + 14-group aggregate + 7-row self-join.",
)
def dq_qq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    q = e.select(
        F.when(
            F.col("ts").cast("timestamp") < F.lit("2024-01-16").cast("timestamp"),
            F.lit("w1"),
        )
        .otherwise(F.lit("w2"))
        .alias("epoch"),
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    hist = q.groupBy("epoch", "v3").agg(F.count("*").cast("long").alias("cnt"))
    grid = hist.select(
        "epoch",
        "v3",
        # windows over the bounded distinct-value grid, not raw rows
        F.sum("cnt").over(W.partitionBy("epoch").orderBy("v3")).cast("long").alias("cum"),
        F.sum("cnt").over(W.partitionBy("epoch")).cast("long").alias("n"),
    )
    oct_ = (
        grid.select(
            "epoch",
            "v3",
            "cum",
            "n",
            F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("k"),
        )
        # value at rank t_k = (n*k) DIV 8 == smallest grid value whose
        # cumulative count reaches t_k (== the oracle's MAX v3 with
        # rn*8 <= n*k, since ranks of equal values are consecutive);
        # t_k >= 1 guard mirrors the oracle dropping empty rank sets
        .where(
            (F.col("cum") >= F.expr("(n * k) DIV 8"))
            & (F.expr("(n * k) DIV 8") >= F.lit(1))
        )
        .groupBy("epoch", "k")
        .agg(F.min("v3").alias("qv"))
    )
    a = oct_.where("epoch = 'w1'").select(
        F.col("k").alias("octile"), F.col("qv").alias("w1_value")
    )
    b = oct_.where("epoch = 'w2'").select(
        F.col("k").alias("octile"), F.col("qv").alias("w2_value")
    )
    return a.join(b, "octile").select(
        F.col("octile").cast("int").alias("octile"),
        "w1_value",
        "w2_value",
        (F.col("w2_value") - F.col("w1_value")).cast("long").alias("drift"),
    )


@register(
    "fn_surrogate_key",
    oracle="""
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                   AS sk,
               lang
        FROM documents
    """,
    doc="Deterministic surrogate-key assignment — dense sequential "
    "BIGINT ids for a dimension load, the task people reach for "
    "monotonically_increasing_id() for and then get burned: that "
    "function's values depend on partition layout (rerun with "
    "different parallelism -> different keys), are sparse, and "
    "cannot be reproduced by a downstream verifier. Here the id IS a "
    "function of the data: row_number over the md5-of-natural-key "
    "total order (hash order so the sort is uncorrelated with insert "
    "order — no hot tail when the natural key is monotone; doc_id "
    "tiebreak makes it total). Same keys at any parallelism, any "
    "rerun, any engine — the oracle proves it. r7: executes through "
    "plans/rank.py's distributed exact rank (range-repartition on the "
    "md5 order + bounded per-range offsets — exactly the zipWithIndex "
    "two-pass shape the r2 docstring promised for billion-row "
    "dimensions), so even a dimension that isn't small sorts in "
    "parallel; output unchanged.",
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarflare_etl_pipeline_spark.plans.rank import with_global_rank

    d = table(spark, sf_dir, "documents")
    ranked = with_global_rank(
        d.select("doc_id", "lang"),
        [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")],
        "sk",
    )
    return ranked.select("doc_id", "sk", "lang")


ANONYMITY_K = 5


@register(
    "dq_k_anonymity",
    oracle=f"""
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               c_mktsegment,
               COUNT(*) AS group_size,
               COUNT(*) < {ANONYMITY_K} AS below_k,
               COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                   WHEN c_acctbal < 5000 THEN 'mid'
                                   ELSE 'high' END) AS l_diversity
        FROM customer
        GROUP BY 1, 2
    """,
    doc="Privacy-release audit: k-anonymity and l-diversity per quasi-"
    "identifier group. QI = (nation, market segment); a group smaller "
    "than k = 5 re-identifies its members and must be generalized or "
    "suppressed before the table leaves the boundary — the audit a "
    "training-data pipeline runs before shipping user-derived tables, "
    "the flag-side complement of llm_pii_scrub's redaction. l-diversity "
    "counts distinct sensitive-attribute classes (account-balance band) "
    "inside each group: k-anonymous but l=1 groups still leak the "
    "sensitive value by membership alone. One partial+final hash agg "
    "(count + distinct-of-3-classes rewrites to a 3-bit or-merge) — "
    "dimension-bounded output, 100 TB cost is the single scan.",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            "c_mktsegment",
        )
        .agg(
            F.count("*").alias("group_size"),
            (F.count("*") < ANONYMITY_K).alias("below_k"),
            F.countDistinct(band).alias("l_diversity"),
        )
    )


@register(
    "dq_table_diff",
    oracle="""
        WITH b AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 97 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice
            FROM orders WHERE o_orderkey % 101 <> 0
        ),
        j AS (
            SELECT a.o_orderkey IS NULL AS added,
                   b.o_orderkey IS NULL AS removed,
                   (a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                    AND a.o_orderstatus <> b.o_orderstatus)
                     AS status_changed,
                   (a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
                    AND a.o_totalprice <> b.o_totalprice) AS price_changed
            FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        )
        SELECT CASE WHEN added THEN 'added'
                    WHEN removed THEN 'removed'
                    WHEN status_changed OR price_changed THEN 'changed'
                    ELSE 'unchanged' END AS diff_type,
               COUNT(*) AS n_keys,
               CAST(SUM(CASE WHEN status_changed THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_status_changed,
               CAST(SUM(CASE WHEN price_changed THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_price_changed
        FROM j
        GROUP BY 1
    """,
    doc="Snapshot reconciliation (table diff): FULL OUTER join of two "
    "snapshot generations on the business key, classifying every key as "
    "added / removed / changed / unchanged with per-column change "
    "counts — the migration-validation and CDC-audit primitive (did the "
    "new loader produce the same table, and if not, which columns "
    "drifted?). Snapshot B is derived in-query (keys % 101 deleted, "
    "status mutated on % 97) so both engines see identical inputs. "
    "Plan: both sides hash-partition on the key into ONE shuffle join; "
    "column compares are narrow projections. At 100 TB the documented "
    "cheap path is a per-bucket checksum pre-pass (compare "
    "xor(hash(row)) per key-bucket, then full-diff only unequal "
    "buckets) — the full-outer form registered here is the exact leg "
    "that runs over the unequal buckets.",
)
def dq_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    b = (
        a.where(F.col("o_orderkey") % 101 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 97 == 0, "X").otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    j = a.alias("a").join(
        b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full"
    )
    present = (
        F.col("a.o_orderkey").isNotNull() & F.col("b.o_orderkey").isNotNull()
    )
    j = j.select(
        F.col("a.o_orderkey").isNull().alias("added"),
        F.col("b.o_orderkey").isNull().alias("removed"),
        (present & (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))).alias(
            "status_changed"
        ),
        (present & (F.col("a.o_totalprice") != F.col("b.o_totalprice"))).alias(
            "price_changed"
        ),
    )
    diff_type = (
        F.when(F.col("added"), "added")
        .when(F.col("removed"), "removed")
        .when(F.col("status_changed") | F.col("price_changed"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(diff_type.alias("diff_type")).agg(
        F.count("*").alias("n_keys"),
        F.sum(F.col("status_changed").cast("int"))
        .cast("long")
        .alias("n_status_changed"),
        F.sum(F.col("price_changed").cast("int"))
        .cast("long")
        .alias("n_price_changed"),
    )


GAP_BUCKET = 1000  # sequence keys per gap-scan bucket


@register(
    "dq_sequence_gaps",
    oracle="""
        WITH s AS (
            SELECT o_orderkey AS k,
                   LAG(o_orderkey) OVER (ORDER BY o_orderkey) AS prev_k
            FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT prev_k + 1 AS gap_start,
               k - 1 AS gap_end,
               k - prev_k - 1 AS gap_len
        FROM s WHERE k - prev_k > 1
    """,
    doc="Sequence-gap detection (missing-key audit over an expected-"
    "dense id space — the completeness check for ingestion ledgers and "
    "CDC offset ranges), filtered to 'F' orders so the fixture actually "
    "has gaps. The ORACLE is the textbook global LAG — which Spark "
    "would execute on a SINGLE partition (WindowExec with no PARTITION "
    "BY moves every row to one task: the classic 100 TB killer). The "
    "Spark side instead runs the TWO-LEVEL form: keys bucket by "
    "k DIV 1000, intra-bucket gaps come from LAG inside each bucket "
    "partition (parallel), and cross-bucket gaps from one LAG over the "
    "per-bucket (min, max) summary table — dimension-sized, same "
    "bounded-single-partition discipline as agg_proportional_allocate. "
    "Result sets are provably identical: every gap either lies inside "
    "one bucket's key run or spans the boundary between two occupied "
    "buckets' extrema (empty buckets in between collapse into the "
    "boundary gap). All-BIGINT → hash-exact.",
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .withColumn("bucket", F.expr(f"k DIV {GAP_BUCKET}"))
    )
    in_bucket = Window.partitionBy("bucket").orderBy("k")
    intra = (
        keys.withColumn("prev_k", F.lag("k").over(in_bucket))
        .where(F.col("k") - F.col("prev_k") > 1)
        .select(
            (F.col("prev_k") + 1).alias("gap_start"),
            (F.col("k") - 1).alias("gap_end"),
            (F.col("k") - F.col("prev_k") - 1).alias("gap_len"),
        )
    )
    summary = keys.groupBy("bucket").agg(
        F.min("k").alias("min_k"), F.max("k").alias("max_k")
    )
    by_bucket = Window.partitionBy().orderBy("bucket")  # |buckets| rows only
    boundary = (
        summary.withColumn("prev_max", F.lag("max_k").over(by_bucket))
        .where(F.col("min_k") - F.col("prev_max") > 1)
        .select(
            (F.col("prev_max") + 1).alias("gap_start"),
            (F.col("min_k") - 1).alias("gap_end"),
            (F.col("min_k") - F.col("prev_max") - 1).alias("gap_len"),
        )
    )
    return intra.unionAll(boundary)


#: The schema's FK edges: (child table, fk col, parent table, pk col).
FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@register(
    "dq_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{child}.{fk} -> {parent}.{pk}' AS fk_edge,
               (SELECT COUNT(*) FROM {child}) AS n_child_rows,
               (SELECT COUNT(*) FROM {child} c
                WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pk} = c.{fk})) AS n_orphans
        """
        for child, fk, parent, pk in FK_EDGES
    ),
    doc="Referential-integrity audit over every FK edge of the schema "
    "(the constraint check a lakehouse can't delegate to the storage "
    "layer — parquet enforces nothing): per edge, child row count and "
    "orphan count via a LEFT ANTI join against the parent's key "
    "projection. All seven edges audit in one job; each anti join "
    "shuffles on its own key (dimension parents broadcast), and a "
    "nonzero n_orphans is the signal that gates a load downstream "
    "(same role as dq_expectations' rule rows). The audit reads each "
    "parent as a key-only projection — column pruning keeps the "
    "parent side scan-light at 100 TB. ONE lazy plan: per edge, the "
    "child-count aggregate and the anti-join-count aggregate combine "
    "through a 1 x 1 join (the agg_sketch_mergeable theorem-join "
    "shape, not a data-scale product) and the seven edge rows union — "
    "no driver-side counting loop, every edge audits in parallel. "
    "All BIGINT/VARCHAR → hash-exact.",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = []
    for child, fk, parent, pk in FK_EDGES:
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(pk)
        totals = c.agg(F.count("*").alias("n_child_rows"))
        orphans = c.join(p, c[fk] == p[pk], "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        edges.append(
            totals.join(orphans).select(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
            )
        )
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


STALE_DAYS = 7


@register(
    "dq_freshness",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id, MAX(CAST(ts AS TIMESTAMP)) AS last_seen,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id
        ),
        wm AS (SELECT MAX(last_seen) AS watermark FROM per_user)
        SELECT p.user_id, p.last_seen, p.n_events,
               (EPOCH_US(CAST(w.watermark AS TIMESTAMP))
                - EPOCH_US(CAST(p.last_seen AS TIMESTAMP)))
                 // 60000000 AS staleness_minutes,
               p.last_seen < w.watermark - INTERVAL {STALE_DAYS} DAY
                 AS is_stale
        FROM per_user p, wm w
    """,
    doc="Data-freshness audit: per entity, the lag between its last "
    "event and the CORPUS WATERMARK (the max timestamp in the table — "
    "a deterministic reference, unlike wall-clock now(), so the audit "
    "is reproducible and oracle-checkable), with a staleness flag at "
    f"{STALE_DAYS} days — the per-source liveness report every "
    "ingestion dashboard runs. Staleness is integer epoch-microsecond "
    "arithmetic (rule 23 spelling) DIV-ed to minutes — date_diff('minute') "
    "counts boundary CROSSINGS in DuckDB but elapsed minutes in Spark, "
    "so the portable form avoids the off-by-one. One hash agg per user, one 1-row "
    "watermark aggregate broadcast back (N x 1, the scalar-threshold "
    "shape). Integer minutes via date_diff → hash-exact.",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"), F.count("*").alias("n_events")
    )
    wm = per_user.agg(F.max("last_seen").alias("watermark"))
    return per_user.join(F.broadcast(wm)).select(
        "user_id",
        "last_seen",
        "n_events",
        F.expr(
            "(unix_micros(CAST(watermark AS TIMESTAMP))"
            " - unix_micros(CAST(last_seen AS TIMESTAMP))) DIV 60000000"
        ).alias("staleness_minutes"),
        (
            F.col("last_seen")
            < F.col("watermark") - F.expr(f"INTERVAL {STALE_DAYS} DAY")
        ).alias("is_stale"),
    )


@register(
    "dq_outlier_iqr",
    oracle="""
        WITH q AS (
            SELECT event_type,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        hist AS (
            SELECT event_type, v3, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM q GROUP BY event_type, v3
        ),
        grid AS (
            SELECT event_type, v3,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type
                                       ORDER BY v3) AS BIGINT) AS cum,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM hist
        ),
        quart AS (
            SELECT event_type, MAX(n) AS n,
                   MIN(CASE WHEN cum >= (n * 1) // 4 THEN v3 END) AS q1,
                   MIN(CASE WHEN cum >= (n * 3) // 4 THEN v3 END) AS q3
            FROM grid GROUP BY event_type
        )
        SELECT qt.event_type, qt.n, qt.q1, qt.q3,
               qt.q3 - qt.q1 AS iqr,
               CAST(SUM(CASE WHEN 2 * q.v3 < 2 * qt.q1 - 3 * (qt.q3 - qt.q1)
                               OR 2 * q.v3 > 2 * qt.q3 + 3 * (qt.q3 - qt.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM q JOIN quart qt ON qt.event_type = q.event_type
        GROUP BY qt.event_type, qt.n, qt.q1, qt.q3
    """,
    doc="Tukey-fence outlier audit (1.5x IQR) per event type — the "
    "robust complement to ts_zscore_anomaly (fences from order "
    "statistics are insensitive to the outliers they hunt; z-scores "
    "are not): quartiles are EXACT order statistics read off the "
    "cumulative distinct-value grid (the dq_qq_drift discipline — "
    "grid bounded by the x1000 discretization), the 1.5x fence "
    "comparison is kept in integers by doubling both sides (2v < "
    "2q1 - 3iqr), and the verdict pass is one broadcast join of the "
    "|types|-row fence table back onto the scan. Zero floats end to "
    "end — hash-exact.",
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    q = e.select(
        "event_type", F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3")
    )
    hist = q.groupBy("event_type", "v3").agg(F.count("*").cast("long").alias("cnt"))
    grid = hist.select(
        "event_type",
        "v3",
        F.sum("cnt").over(W.partitionBy("event_type").orderBy("v3")).cast("long").alias("cum"),
        F.sum("cnt").over(W.partitionBy("event_type")).cast("long").alias("n"),
    )
    quart = grid.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= F.expr("(n * 1) DIV 4"), F.col("v3"))).alias("q1"),
        F.min(F.when(F.col("cum") >= F.expr("(n * 3) DIV 4"), F.col("v3"))).alias("q3"),
    )
    j = q.join(F.broadcast(quart), "event_type")
    is_out = (
        (2 * F.col("v3") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1")))
        | (2 * F.col("v3") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1")))
    ).cast("int")
    return j.groupBy("event_type", "n", "q1", "q3").agg(
        (F.col("q3") - F.col("q1")).alias("iqr"),
        F.sum(is_out).cast("long").alias("n_outliers"),
    ).select("event_type", "n", "q1", "q3", "iqr", "n_outliers")


PSI_BINS = 10
PSI_SMOOTH_NUM, PSI_SMOOTH_DEN = 1, 2  # +0.5 Laplace smoothing per bin


@register(
    "dq_value_drift_psi",
    oracle=f"""
        WITH q AS (
            SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP'2024-01-16'
                        THEN 1 ELSE 2 END AS epoch,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        hist1 AS (
            SELECT v3, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM q WHERE epoch = 1 GROUP BY v3
        ),
        grid AS (
            SELECT v3,
                   CAST(SUM(cnt) OVER (ORDER BY v3) AS BIGINT) AS cum,
                   CAST(SUM(cnt) OVER () AS BIGINT) AS n
            FROM hist1
        ),
        bounds AS (
            SELECT k, MIN(v3) AS b
            FROM grid, UNNEST(RANGE(1, {PSI_BINS})) t(k)
            WHERE cum >= (n * k) // {PSI_BINS} AND (n * k) // {PSI_BINS} >= 1
            GROUP BY k
        ),
        counts AS (
            SELECT vv.epoch, bn.bin, CAST(SUM(vv.c) AS BIGINT) AS c
            FROM (SELECT epoch, v3, COUNT(*) AS c FROM q GROUP BY epoch, v3) vv
            JOIN (
                SELECT v3,
                       CAST(COALESCE(SUM(CASE WHEN g.v3 > b.b THEN 1 ELSE 0 END), 0)
                            AS BIGINT) AS bin
                FROM (SELECT DISTINCT v3 FROM q) g LEFT JOIN bounds b ON TRUE
                GROUP BY v3
            ) bn ON bn.v3 = vv.v3
            GROUP BY vv.epoch, bn.bin
        ),
        tot AS (
            SELECT epoch, SUM(c) AS n FROM counts GROUP BY epoch
        ),
        bins AS (SELECT UNNEST(RANGE(0, {PSI_BINS})) AS bin),
        filled AS (
            SELECT e.epoch, bins.bin, COALESCE(c.c, 0) AS c, e.n
            FROM bins CROSS JOIN tot e
            LEFT JOIN counts c ON c.epoch = e.epoch AND c.bin = bins.bin
        ),
        props AS (
            SELECT f1.bin,
                   f1.c AS c1, f2.c AS c2,
                   (CAST(f1.c AS DOUBLE) + 0.5)
                       / (f1.n + 0.5 * {PSI_BINS}) AS p1,
                   (CAST(f2.c AS DOUBLE) + 0.5)
                       / (f2.n + 0.5 * {PSI_BINS}) AS p2
            FROM filled f1 JOIN filled f2 ON f2.bin = f1.bin
            WHERE f1.epoch = 1 AND f2.epoch = 2
        )
        SELECT CAST(bin AS BIGINT) AS bin, c1, c2, p1, p2,
               (p2 - p1) * LN(p2 / p1) AS psi_term
        FROM props
    """,
    doc=f"Population Stability Index between the two fixture epochs — "
    f"THE model-monitoring drift metric (scorecard governance: "
    f"PSI < 0.1 stable, > 0.25 investigate): bins are the FIRST "
    f"epoch's exact deciles read off the cumulative distinct-value "
    f"grid (the dq_qq_drift discipline), every row bins by counting "
    f"boundaries below its value (a bounded 9-row broadcast), both "
    f"epochs' bin masses get +0.5 Laplace smoothing so an empty "
    f"target bin cannot blow up the log, and each bin's "
    f"(p2-p1)*ln(p2/p1) term is emitted PER BIN (hash-exact per row; "
    f"the scalar total is the reader's 10-row sum) — no cross-row "
    f"float accumulation inside the engine. Complements dq_qq_drift "
    f"(shape) and dq_histogram_drift (fixed bins) with the "
    f"industry-standard score.",
)
def dq_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    q = e.select(
        F.when(
            F.col("ts").cast("timestamp") < F.lit("2024-01-16").cast("timestamp"), 1
        )
        .otherwise(2)
        .alias("epoch"),
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    vv = q.groupBy("epoch", "v3").agg(F.count("*").alias("c"))
    hist1 = vv.where(F.col("epoch") == 1).select("v3", F.col("c").alias("cnt"))
    grid = hist1.select(
        "v3",
        F.sum("cnt").over(W.orderBy("v3")).cast("long").alias("cum"),
        F.sum("cnt").over(W.partitionBy()).cast("long").alias("n"),
    )
    bounds = (
        grid.select(
            "v3", "cum", "n",
            F.explode(F.sequence(F.lit(1), F.lit(PSI_BINS - 1))).alias("k"),
        )
        .where(
            (F.col("cum") >= F.expr(f"(n * k) DIV {PSI_BINS}"))
            & (F.expr(f"(n * k) DIV {PSI_BINS}") >= 1)
        )
        .groupBy("k")
        .agg(F.min("v3").alias("b"))
    )
    bins_of_v = (
        vv.select("v3").distinct()
        .crossJoin(F.broadcast(bounds))  # bounded: |grid| x 9
        .groupBy("v3")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("v3") > F.col("b"), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("bin")
        )
    )
    counts = (
        vv.join(bins_of_v, "v3")
        .groupBy("epoch", "bin")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    tot = counts.groupBy("epoch").agg(F.sum("c").alias("n"))
    bins = spark.range(0, PSI_BINS).select(F.col("id").alias("bin"))
    filled = (
        bins.crossJoin(F.broadcast(tot))  # bounded: 10 x 2
        .join(counts, ["epoch", "bin"], "left")
        .select("epoch", "bin", F.coalesce(F.col("c"), F.lit(0)).alias("c"), "n")
    )
    f1 = filled.where(F.col("epoch") == 1).select(
        "bin", F.col("c").alias("c1"), F.col("n").alias("n1")
    )
    f2 = filled.where(F.col("epoch") == 2).select(
        "bin", F.col("c").alias("c2"), F.col("n").alias("n2")
    )
    p1 = (F.col("c1").cast("double") + 0.5) / (F.col("n1") + 0.5 * PSI_BINS)
    p2 = (F.col("c2").cast("double") + 0.5) / (F.col("n2") + 0.5 * PSI_BINS)
    return f1.join(f2, "bin").select(
        F.col("bin").cast("long").alias("bin"),
        "c1",
        "c2",
        p1.alias("p1"),
        p2.alias("p2"),
        ((p2 - p1) * F.log(p2 / p1)).alias("psi_term"),
    )


@register(
    "sample_sequential_poisson",
    oracle="""
        WITH pri AS (
            SELECT doc_id, lang, n_chars,
                   (CAST(n_chars AS BIGINT) * 1000000000000)
                     // (CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) + 1) AS priority
            FROM documents
        )
        SELECT doc_id, lang, n_chars, priority
        FROM pri
        ORDER BY priority DESC, doc_id
        LIMIT 100
    """,
    doc="Sequential Poisson sampling (Ohlsson 1998) — EXACT-k weighted "
    "sampling without replacement, the missing sibling of "
    "sample_quality_weighted (per-row Bernoulli: deterministic but "
    "only expected-k) and sample_reservoir_per_group (uniform): each "
    "doc gets priority w/u with w = n_chars and u the portable md5 "
    "bucket (sample_hash_split's hash, +1 to dodge zero), and the k "
    "largest priorities are the sample — inclusion probability "
    "proportional to size, reproducible at any parallelism, stable "
    "under reruns. The ratio is materialized as the INTEGER "
    "floor(w * 10^12 / u) (w <= 10^6 keeps it inside BIGINT; identical "
    "`DIV`//`//` semantics both engines) so the ordering — and hence "
    "the sample — is bit-exact cross-engine with doc_id as the total "
    "tie-break. Plan: narrow map then TakeOrderedAndProject — "
    "per-partition top-k heaps merged on the driver, NO global sort "
    "and no shuffle of non-winners; at 100 TB each of ~10^5 tasks "
    "ships only k rows, and the same priority column supports "
    "threshold-refinement (pre-filter priority > p0 from a previous "
    "epoch) when even that is too much.",
)
def sample_sequential_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    pri = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.col("n_chars").cast("long") * F.lit(1000000000000).cast("long"))
        .cast("long")
        .alias("w12"),
        u.alias("u"),
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr("w12 DIV u").alias("priority"),
    )
    return pri.orderBy(F.desc("priority"), "doc_id").limit(100)


@register(
    "sample_class_balanced",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4))
                                     AS INTEGER) % 1000,
                                doc_id
                   ) AS class_rank
            FROM documents
        ),
        m AS (
            SELECT CAST(MIN(c) AS BIGINT) AS m_min
            FROM (SELECT COUNT(*) AS c FROM documents GROUP BY lang)
        )
        SELECT doc_id, lang, class_rank
        FROM ranked, m
        WHERE class_rank <= m_min
        ORDER BY lang, class_rank
    """,
    doc="Class-balanced exact subsample — downsample every language to "
    "the MINORITY class count (the classifier-training counterpart of "
    "llm_oversample_mixture's upsampling): rank docs within each lang "
    "by (md5 shuffle bucket, doc_id) — a deterministic, "
    "parallelism-independent shuffle order (sample_hash_split's hash) — "
    "and keep rank <= min class count, yielding EXACTLY equal classes "
    "with a reproducible membership. lang has ~5 values, so a plain "
    "partitionBy(lang) ranking window is the low-cardinality "
    "single-task trap (VERDICT r6 #2); ranks come from "
    "plans/rank.with_grouped_rank instead — range-repartition on "
    "(lang, bucket, doc_id), per-partition row_number, bounded offset "
    "join — bit-identical to the window spelling, parallel at any "
    "scale. The min class count is a SINGLE-ROW scalar broadcast onto "
    "the ranked stream (the dq_freshness N×1 shape).",
)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarflare_etl_pipeline_spark.plans.rank import with_grouped_rank

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 1000
    )
    ranked = with_grouped_rank(
        d.withColumn("bucket", bucket),
        ["lang"],
        ["bucket", "doc_id"],
        rank_col="class_rank",
    )
    m = (
        d.groupBy("lang")
        .count()
        .agg(F.min("count").cast("long").alias("m_min"))
    )
    return (
        ranked.join(F.broadcast(m))
        .where(F.col("class_rank") <= F.col("m_min"))
        .select("doc_id", "lang", "class_rank")
        .orderBy("lang", "class_rank")
    )


#: Systematic sampling interval: every SYS_K-th row of the ordered frame.
SYS_K = 97


@register(
    "sample_systematic",
    oracle=f"""
        WITH r AS (
            SELECT l_orderkey, l_linenumber, l_quantity,
                   ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, l_quantity, rn
        FROM r WHERE rn % {SYS_K} = 1
        ORDER BY rn
    """,
    doc=f"Systematic (interval) sampling — every {SYS_K}-th row of the "
    f"frame under the order (l_orderkey, l_linenumber, l_quantity) — "
    f"the fixture's lineitem key is NOT unique, so the sort covers "
    f"every output column: rows that still tie are identical tuples, "
    f"making rank interchange output-invariant — the "
    f"classic equal-probability design whose samples are evenly "
    f"spread across the sort dimension (survey-sampling textbooks; "
    f"contrast sample_hash_split's unordered Bernoulli and "
    f"sample_sequential_poisson's weighted top-k). The global row "
    f"number comes from plans/rank.with_global_rank — range "
    f"repartition + per-partition rank + bounded offset join, "
    f"bit-identical to the single-partition ROW_NUMBER window the "
    f"oracle spells but with NO single-task stage (the fourth "
    f"consumer of the distributed-rank primitive). At 100 TB: one "
    f"range shuffle, then a narrow modulo filter that ships only "
    f"1/{SYS_K} of rows — deterministic, resumable, and the fixed "
    f"phase (rn % {SYS_K} = 1) makes disjoint replicate samples "
    f"(phase 2..{SYS_K}) free.",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from solarflare_etl_pipeline_spark.plans.rank import with_global_rank

    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    ranked = with_global_rank(
        l, ["l_orderkey", "l_linenumber", "l_quantity"], rank_col="rn"
    )
    return (
        ranked.where(F.col("rn") % SYS_K == 1)
        .select("l_orderkey", "l_linenumber", "l_quantity", "rn")
        .orderBy("rn")
    )


@register(
    "dq_fd_violations",
    oracle="""
        WITH fd1 AS (
            SELECT 'lineitem:(okey,lineno)->quantity' AS fd,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
            FROM (SELECT COUNT(DISTINCT l_quantity) AS nd
                  FROM lineitem GROUP BY l_orderkey, l_linenumber)
        ),
        fd2 AS (
            SELECT 'orders:okey->custkey' AS fd,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
            FROM (SELECT COUNT(DISTINCT o_custkey) AS nd
                  FROM orders GROUP BY o_orderkey)
        ),
        fd3 AS (
            SELECT 'events:user->event_type' AS fd,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
            FROM (SELECT COUNT(DISTINCT event_type) AS nd
                  FROM events GROUP BY user_id)
        ),
        fd4 AS (
            SELECT 'customer:custkey->nationkey' AS fd,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
            FROM (SELECT COUNT(DISTINCT c_nationkey) AS nd
                  FROM customer GROUP BY c_custkey)
        ),
        u AS (
            SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
            UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
        )
        SELECT fd, n_groups, n_violating,
               CAST(n_violating * 1000000 // n_groups AS BIGINT)
                   AS violation_rate_micro
        FROM u ORDER BY fd
    """,
    doc="Approximate functional-dependency profiling (the TANE/"
    "Papenbrock family's verification step, fixed candidate set): for "
    "each declared FD X -> Y, count LHS groups whose Y is not unique "
    "— the data-quality primitive behind key discovery, denormalization "
    "audits and 'is this column derivable' questions. The fixture "
    "makes it non-degenerate in both directions: "
    "(l_orderkey, l_linenumber) -> l_quantity is VIOLATED (this "
    "repo's sample_systematic development discovered those duplicate "
    "keys the hard way) while customer's key FD holds — so the op "
    "certifies both detection and absence. Each FD is one hash "
    "aggregate (groupBy LHS, count distinct RHS) reduced to a single "
    "row; rates are floor-divided micros (rule 22). Scale: k "
    "independent mergeable aggregates, unioned bounded rows — "
    "embarrassingly parallel across FDs and partitions.",
)
def dq_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    def check(df, name, lhs, rhs):
        g = df.groupBy(*lhs).agg(F.count_distinct(F.col(rhs)).alias("nd"))
        return g.agg(
            F.lit(name).alias("fd"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum((F.col("nd") > 1).cast("int")).cast("long").alias("n_violating"),
        )

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    u = (
        check(l, "lineitem:(okey,lineno)->quantity", ["l_orderkey", "l_linenumber"], "l_quantity")
        .unionAll(check(o, "orders:okey->custkey", ["o_orderkey"], "o_custkey"))
        .unionAll(check(e, "events:user->event_type", ["user_id"], "event_type"))
        .unionAll(check(c, "customer:custkey->nationkey", ["c_custkey"], "c_nationkey"))
    )
    return u.select(
        "fd",
        "n_groups",
        "n_violating",
        F.expr("CAST(n_violating * 1000000 DIV n_groups AS BIGINT)").alias(
            "violation_rate_micro"
        ),
    ).orderBy("fd")


@register(
    "scan_with_metadata",
    oracle="""
        SELECT 'lineitem.parquet' AS file_name,
               l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
        ORDER BY file_name, l_returnflag
    """,
    doc="Hidden file-metadata columns — Spark's `_metadata.file_name` "
    "(constant-folded from the scan, zero data cost) pulled into the "
    "aggregation grain: the provenance primitive behind per-file row "
    "accounting, bad-file quarantine and incremental-load bookkeeping "
    "('which file did this row come from' without writing lineage "
    "columns into the data). The fixture ships each table as a single "
    "file, so the oracle predicts the metadata column's value as the "
    "literal basename — Spark must actually surface the right file "
    "name from the scan for the hash to match (DuckDB views cannot "
    "expose filename=true, so the contract is spelled from the known "
    "layout). At 100 TB this op audits a 100k-file ingest for "
    "short-written files: one hash aggregate whose key includes a "
    "per-split constant.",
)
def scan_with_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    df = spark.read.parquet(_os.path.join(sf_dir, "lineitem.parquet"))
    return (
        df.select(
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("file_name"),
            "l_returnflag",
        )
        .groupBy("file_name", "l_returnflag")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .orderBy("file_name", "l_returnflag")
    )


@register(
    "dq_reconciliation",
    oracle="""
        WITH l AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS line_cents
            FROM lineitem GROUP BY l_orderkey
        ),
        o AS (
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS order_cents
            FROM orders
        ),
        j AS (
            SELECT o.order_cents, l.line_cents,
                   CASE
                       WHEN l.line_cents IS NULL THEN 'no_lines'
                       WHEN ABS(l.line_cents - o.order_cents) * 100
                            <= o.order_cents THEN 'within_1pct'
                       WHEN ABS(l.line_cents - o.order_cents) * 10
                            <= o.order_cents THEN 'within_10pct'
                       ELSE 'mismatch'
                   END AS status,
                   COALESCE(ABS(l.line_cents - o.order_cents), 0)
                       AS drift_cents
            FROM o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
        )
        SELECT status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(drift_cents) AS BIGINT) AS total_drift_cents,
               CAST(MAX(drift_cents) AS BIGINT) AS max_drift_cents
        FROM j GROUP BY status
        ORDER BY status
    """,
    doc="Cross-table financial reconciliation — does the fact roll up to "
    "the header? Every order's lineitem extended-price total is "
    "compared in exact CENTS against o_totalprice and banded: "
    "no_lines (orphan headers), within_1pct, within_10pct, mismatch "
    "— the daily close-of-books control every warehouse runs between "
    "a detail table and its summary (and the natural companion to "
    "dq_referential_integrity, which checks key EXISTENCE; this "
    "checks VALUE consistency). Tolerance predicates are "
    "cross-multiplied integer inequalities (|Δ|·100 <= total, rule "
    "22) so no boundary order can flip on a ulp. Scale: one hash "
    "aggregate to order grain, an equi join on the order key, a "
    "4-row status aggregate — mergeable end to end; at 100 TB both "
    "sides partition-prune by date if the reconciliation window "
    "is bounded.",
)
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("line_cents")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
            "order_cents"
        ),
    )
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left").select(
        F.expr(
            "CASE WHEN line_cents IS NULL THEN 'no_lines'"
            " WHEN ABS(line_cents - order_cents) * 100 <= order_cents"
            " THEN 'within_1pct'"
            " WHEN ABS(line_cents - order_cents) * 10 <= order_cents"
            " THEN 'within_10pct'"
            " ELSE 'mismatch' END"
        ).alias("status"),
        F.expr("COALESCE(ABS(line_cents - order_cents), 0)").alias(
            "drift_cents"
        ),
    )
    return (
        j.groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("drift_cents").cast("long").alias("total_drift_cents"),
            F.max("drift_cents").cast("long").alias("max_drift_cents"),
        )
        .orderBy("status")
    )


@register(
    "dq_pk_uniqueness",
    oracle="""
        SELECT 'events(event_id)' AS key_name,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT event_id) AS n_distinct,
               COUNT(*) - COUNT(DISTINCT event_id) AS n_excess_rows,
               COUNT(*) = COUNT(DISTINCT event_id) AS is_unique
        FROM events
        UNION ALL
        SELECT 'orders(o_orderkey)',
               COUNT(*), COUNT(DISTINCT o_orderkey),
               COUNT(*) - COUNT(DISTINCT o_orderkey),
               COUNT(*) = COUNT(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'lineitem(l_orderkey,l_linenumber)',
               COUNT(*),
               COUNT(DISTINCT l_orderkey * 1000000 + l_linenumber),
               COUNT(*) - COUNT(DISTINCT l_orderkey * 1000000
                                + l_linenumber),
               COUNT(*) = COUNT(DISTINCT l_orderkey * 1000000
                                + l_linenumber)
        FROM lineitem
        ORDER BY key_name
    """,
    doc="Primary-key uniqueness audit — the most-asked data-quality "
    "check there is, run over three DECLARED keys: events(event_id) "
    "and orders(o_orderkey) hold; lineitem(l_orderkey, l_linenumber) "
    "does NOT on the synthetic fixtures (a real fixture fact first "
    "caught by the fn_business_days re-derivation and recorded in "
    "SURVEY §8 — this op turns that discovery into a standing, "
    "driver-checkable audit instead of a code comment). The "
    "composite key packs into one BIGINT (linenumber < 1e6) so the "
    "distinct count is a single expression in both engines. "
    "COUNT(DISTINCT) is the exact two-phase expand — the audit "
    "wants truth, not an HLL estimate; at 100 TB run it per "
    "partition-day and union, or swap in agg_approx_distinct for "
    "monitoring-grade checks (both registered). One pass per "
    "audited table, no joins.",
)
def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").agg(
        F.lit("events(event_id)").alias("key_name"),
        F.count("*").alias("n_rows"),
        F.countDistinct("event_id").alias("n_distinct"),
        (F.count("*") - F.countDistinct("event_id")).alias("n_excess_rows"),
        (F.count("*") == F.countDistinct("event_id")).alias("is_unique"),
    )
    o = table(spark, sf_dir, "orders").agg(
        F.lit("orders(o_orderkey)").alias("key_name"),
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_distinct"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n_excess_rows"),
        (F.count("*") == F.countDistinct("o_orderkey")).alias("is_unique"),
    )
    lkey = F.col("l_orderkey") * 1000000 + F.col("l_linenumber")
    li = table(spark, sf_dir, "lineitem").agg(
        F.lit("lineitem(l_orderkey,l_linenumber)").alias("key_name"),
        F.count("*").alias("n_rows"),
        F.countDistinct(lkey).alias("n_distinct"),
        (F.count("*") - F.countDistinct(lkey)).alias("n_excess_rows"),
        (F.count("*") == F.countDistinct(lkey)).alias("is_unique"),
    )
    return e.unionAll(o).unionAll(li).orderBy("key_name")


@register(
    "dq_partition_checksums",
    oracle="""
        SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS day,
               COUNT(*) AS n_rows,
               BIT_XOR(event_id) AS xor_event_ids,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    doc="Per-partition reconciliation checksums: one row per day with "
    "the row count, the order-free XOR of event ids, the exact cents "
    "total, and the user cardinality — the manifest two sides of a "
    "replication/backfill compare BY PARTITION to find exactly which "
    "day diverged without ever joining row-level data (dq_table_diff "
    "is the row-level tool you reach for AFTER this table names the "
    "day). XOR is the order-free checksum that catches substituted "
    "ids at equal counts; the cents sum catches value corruption; "
    "all integer-exact. Plan: one partial+final hash aggregate keyed "
    "on the natural partition column — at 100 TB this is the cheap "
    "daily job whose output both sides exchange instead of data.",
)
def dq_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(event_id)").alias("xor_event_ids"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )


@register(
    "dq_cardinality_drift",
    # Epoch-midpoint halves (the diff_in_diff spelling); exact BIGINT
    # distinct counts per column per half, drift as exact ppm with
    # HUGEINT/DECIMAL(38,0) widening before * 1e6.
    oracle="""
        WITH bounds AS (
            SELECT EPOCH_US(MIN(CAST(ts AS TIMESTAMP))) AS lo,
                   EPOCH_US(MAX(CAST(ts AS TIMESTAMP))) AS hi
            FROM events
        ),
        h AS (
            SELECT CASE WHEN EPOCH_US(CAST(ts AS TIMESTAMP))
                             < (bounds.lo + bounds.hi) // 2
                        THEN 0 ELSE 1 END AS half,
                   user_id, event_type,
                   CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS day
            FROM events CROSS JOIN bounds
        )
        SELECT col, n_first, n_second,
               CAST(CAST(n_second AS HUGEINT) * 1000000
                    // NULLIF(n_first, 0) AS BIGINT) AS ratio_ppm
        FROM (
            SELECT 'event_type' AS col,
                   CAST(COUNT(DISTINCT CASE WHEN half = 0
                                       THEN event_type END) AS BIGINT)
                       AS n_first,
                   CAST(COUNT(DISTINCT CASE WHEN half = 1
                                       THEN event_type END) AS BIGINT)
                       AS n_second
            FROM h
            UNION ALL
            SELECT 'user_id',
                   CAST(COUNT(DISTINCT CASE WHEN half = 0
                                       THEN user_id END) AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN half = 1
                                       THEN user_id END) AS BIGINT)
            FROM h
            UNION ALL
            SELECT 'day',
                   CAST(COUNT(DISTINCT CASE WHEN half = 0
                                       THEN day END) AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN half = 1
                                       THEN day END) AS BIGINT)
            FROM h
        )
        ORDER BY col
    """,
    doc="Cardinality drift audit — distinct-value counts per key column "
    "compared across the observation window's epoch-midpoint halves "
    "(the dq companion to dq_value_drift_psi, which tracks the "
    "DISTRIBUTION; this tracks the DOMAIN — a user_id cardinality "
    "collapse means an upstream join started fanning in, an "
    "event_type growth means a new producer went live). Exact "
    "distinct counts (no sketches — this is the audit that certifies "
    "the sketches), ratio in exact ppm, NULL when the first half is "
    "empty. Plan: one pass, three conditional distinct aggregates "
    "over (half, col) — Spark expands COUNT(DISTINCT CASE...) to an "
    "expand + two-level hash agg, map-side combinable; nothing wide "
    "beyond the distinct shuffles at any scale.",
)
def dq_cardinality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    b = e.agg(
        F.min(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).alias("lo"),
        F.max(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).alias("hi"),
    ).collect()[0]
    out_cols = "col string, n_first bigint, n_second bigint, ratio_ppm bigint"
    if b.lo is None:
        # oracle on empty events: three rows of zero counts, NULL ratio
        return spark.createDataFrame(
            [("day", 0, 0, None), ("event_type", 0, 0, None), ("user_id", 0, 0, None)],
            out_cols,
        )
    mid = (int(b.lo) + int(b.hi)) // 2
    h = e.select(
        F.when(
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))") < F.lit(mid), 0
        )
        .otherwise(1)
        .alias("half"),
        "user_id",
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).localCheckpoint()  # one scan feeds the three distinct aggregates

    def drift(col: str) -> DataFrame:
        return h.agg(
            F.lit(col).alias("col"),
            F.count_distinct(F.when(F.col("half") == 0, F.col(col)))
            .cast("long")
            .alias("n_first"),
            F.count_distinct(F.when(F.col("half") == 1, F.col(col)))
            .cast("long")
            .alias("n_second"),
        )

    out = drift("event_type").unionAll(drift("user_id")).unionAll(drift("day"))
    return out.select(
        "col",
        "n_first",
        "n_second",
        F.expr(
            "CAST(CAST(n_second AS DECIMAL(38,0)) * 1000000"
            " DIV NULLIF(n_first, 0) AS BIGINT)"
        ).alias("ratio_ppm"),
    ).orderBy("col")


@register(
    "dq_duplicate_rows",
    oracle="""
        WITH g AS (
            SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
                   CAST(COUNT(*) AS BIGINT) AS mult
            FROM lineitem
            GROUP BY l_orderkey, l_partkey, l_suppkey, l_quantity
        )
        SELECT CAST(COALESCE(SUM(mult), 0) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(COALESCE(SUM(mult), 0) - COUNT(*) AS BIGINT)
                   AS n_excess,
               CAST(COUNT(CASE WHEN mult > 1 THEN 1 END) AS BIGINT)
                   AS n_dup_classes,
               CAST(COALESCE(MAX(mult), 0) AS BIGINT) AS max_multiplicity
        FROM g
    """,
    doc="Full-tuple duplicate census over a projected natural key "
    "(lineitem's (orderkey, partkey, suppkey, quantity) — chosen "
    "because the fixture's declared PK is known non-unique, "
    "dq_pk_uniqueness's standing finding): total rows, distinct "
    "tuples, excess copies, duplicate-class count, and the worst "
    "multiplicity — the one-row answer to 'did the loader "
    "double-insert' that every idempotent-ingest audit starts with "
    "(reference R7's keyed idempotent load is exactly the discipline "
    "this verifies after the fact). Plan: one hash aggregate on the "
    "tuple (map-side combinable) + a single-row fold over the class "
    "table — two shuffles, nothing wide at any scale.",
)
def dq_duplicate_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    g = l.groupBy(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    ).agg(F.count("*").cast("long").alias("mult"))
    return g.agg(
        F.coalesce(F.sum("mult"), F.lit(0)).cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_distinct"),
        (F.coalesce(F.sum("mult"), F.lit(0)) - F.count("*"))
        .cast("long")
        .alias("n_excess"),
        F.count(F.when(F.col("mult") > 1, 1)).cast("long").alias("n_dup_classes"),
        F.coalesce(F.max("mult"), F.lit(0)).cast("long").alias("max_multiplicity"),
    )


@register(
    "dq_distribution_shift_emd",
    # 1-D Wasserstein (earth mover's) distance between the event-value
    # distributions of the window's two epoch halves, computed EXACTLY:
    # EMD = sum over the distinct-value grid of |F_a - F_b| * gap, with
    # the CDF difference cleared of divisions via |cumA*nB - cumB*nA|
    # (rule 22) and the scaled sum HUGEINT/DECIMAL-accumulated. The
    # cumulative window runs over the distinct milli-value grid — the
    # agg_mann_whitney value-domain-bounded exemption.
    oracle="""
        WITH b AS (
            SELECT CAST(FLOOR(value * 1000) AS BIGINT) AS v,
                   EPOCH_US(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        span AS (
            SELECT MIN(us) AS lo, MAX(us) AS hi FROM b
        ),
        h AS (
            SELECT v,
                   CASE WHEN us < (span.lo + span.hi) // 2
                        THEN 0 ELSE 1 END AS half
            FROM b CROSS JOIN span
        ),
        n AS (
            SELECT CAST(SUM(1 - half) AS BIGINT) AS n_a,
                   CAST(SUM(half) AS BIGINT) AS n_b
            FROM h
        ),
        g AS (
            SELECT v,
                   CAST(SUM(1 - half) AS BIGINT) AS ca,
                   CAST(SUM(half) AS BIGINT) AS cb
            FROM h GROUP BY v
        ),
        c AS (
            SELECT v,
                   SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS cum_a,
                   SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS cum_b,
                   LEAD(v) OVER (ORDER BY v) AS v_next
            FROM g
        ),
        t AS (
            SELECT CAST(SUM(ABS(CAST(cum_a AS HUGEINT) * n.n_b
                                - CAST(cum_b AS HUGEINT) * n.n_a)
                            * (v_next - v)) AS HUGEINT) AS emd_scaled,
                   COUNT(*) AS n_grid
            FROM c CROSS JOIN n
            WHERE v_next IS NOT NULL
        )
        SELECT n.n_a, n.n_b,
               CAST(t.n_grid AS BIGINT) AS n_grid,
               CAST(COALESCE(t.emd_scaled // (n.n_a * n.n_b), 0)
                    AS BIGINT) AS emd_milli_units,
               CAST(((COALESCE(t.emd_scaled, 0) % 1000000000)
                     + 1000000000) % 1000000000 AS BIGINT)
                   AS emd_scaled_mod9
        FROM n CROSS JOIN t
        WHERE n.n_a > 0 AND n.n_b > 0
    """,
    doc="Exact 1-D earth mover's (Wasserstein-1) distance between the "
    "event-value distributions of the observation window's first and "
    "second epoch halves — the transport-metric member of the drift "
    "family (PSI bins and saturates, KS takes the max gap, AD weights "
    "the tails; EMD measures HOW FAR probability mass moved in value "
    "units, which is what a monitor needs to rank drifts by business "
    "impact). Computed with no float anywhere: on the distinct "
    "milli-value grid, |F_a - F_b| is cleared to |cumA*n_b - cumB*n_a| "
    "(rule 22), multiplied by the integer value gap, HUGEINT-summed, "
    "and emitted as exact milli-value units (floor division by "
    "n_a*n_b) plus the pmod-1e9 residue of the full scaled sum. The "
    "cumulative window runs over the value-domain-bounded distinct "
    "grid (the agg_mann_whitney exemption: 2-dp money spans <= ~1e6 "
    "distinct milli values at ANY corpus size). Plan: one epoch-span "
    "scalar, one (value, half) aggregate, bounded-grid windows, one "
    "fold.",
)
def dq_distribution_shift_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    b = e.select(
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
    )
    span = b.agg(F.min("us").alias("lo"), F.max("us").alias("hi")).collect()[0]
    out_schema = (
        "n_a bigint, n_b bigint, n_grid bigint,"
        " emd_milli_units bigint, emd_scaled_mod9 bigint"
    )
    if span.lo is None:
        return spark.createDataFrame([], out_schema)
    mid = (int(span.lo) + int(span.hi)) // 2
    h = b.select(
        "v", F.when(F.col("us") < mid, 0).otherwise(1).alias("half")
    )
    h = h.localCheckpoint()  # feeds the totals scalar AND the grid agg
    n = h.agg(
        F.sum(1 - F.col("half")).cast("long").alias("n_a"),
        F.sum("half").cast("long").alias("n_b"),
    ).collect()[0]
    if not n.n_a or not n.n_b:
        return spark.createDataFrame([], out_schema)
    n_a, n_b = int(n.n_a), int(n.n_b)
    g = h.groupBy("v").agg(
        F.sum(1 - F.col("half")).cast("long").alias("ca"),
        F.sum("half").cast("long").alias("cb"),
    )
    cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    lead = Window.orderBy("v")
    c = g.select(
        "v",
        F.sum("ca").over(cum).alias("cum_a"),
        F.sum("cb").over(cum).alias("cum_b"),
        F.lead("v").over(lead).alias("v_next"),
    )
    t = c.where(F.col("v_next").isNotNull()).agg(
        F.sum(
            F.expr(
                f"ABS(CAST(cum_a AS DECIMAL(38,0)) * {n_b}"
                f" - CAST(cum_b AS DECIMAL(38,0)) * {n_a})"
                " * (v_next - v)"
            )
        ).alias("emd_scaled"),
        F.count("*").cast("long").alias("n_grid"),
    )
    return t.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        "n_grid",
        F.expr(
            f"CAST(COALESCE(emd_scaled DIV {n_a * n_b}, 0) AS BIGINT)"
        ).alias("emd_milli_units"),
        F.expr(
            "CAST(((COALESCE(emd_scaled, 0) % 1000000000) + 1000000000)"
            " % 1000000000 AS BIGINT)"
        ).alias("emd_scaled_mod9"),
    )


@register(
    "sample_weighted_priority",
    oracle="""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   CAST(FLOOR(
                       -LN((CAST(('0x' || SUBSTR(MD5('wrs:'
                               || CAST(doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) + 0.5) / 4294967296.0)
                       / CAST(n_chars AS DOUBLE) * 1e12) AS BIGINT)
                       AS key_e12
            FROM documents
            WHERE n_chars > 0
        ),
        ranked AS (
            SELECT doc_id, n_chars, key_e12,
                   ROW_NUMBER() OVER (ORDER BY key_e12, doc_id) AS rnk
            FROM keyed
        )
        SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars, key_e12
        FROM ranked
        WHERE rnk <= 50
        ORDER BY rnk
    """,
    doc="Weighted sampling WITHOUT replacement via exponential priority "
    "keys (Efraimidis-Spirakis A-ES, the one-pass distributed-"
    "reservoir trick: each item draws key = -ln(u)/w and the k "
    "SMALLEST keys are the weighted sample — mergeable across "
    "partitions, so 100 TB needs exactly one TakeOrderedAndProject, "
    "never a global shuffle): u from an md5 32-bit coin (the "
    "sample_hash_split portable spelling), w = n_chars, and the key "
    "FLOOR-quantized to e-12 units BEFORE ranking so the selection "
    "order is integer-deterministic cross-engine (ties broken by "
    "doc_id). Complements sample_sequential_poisson (fixed-rate "
    "inclusion) with the fixed-SIZE weighted draw. Plan: pure map + "
    "top-50 — no shuffle beyond the take-ordered reduction.",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.expr(
            "CAST(FLOOR(-LN((CAST(conv(substr(md5(concat('wrs:',"
            " CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) + 0.5)"
            " / 4294967296.0) / CAST(n_chars AS DOUBLE) * 1e12) AS BIGINT)"
        ).alias("key_e12"),
    )
    ranked = keyed.select(
        "doc_id",
        "n_chars",
        "key_e12",
        F.row_number()
        .over(Window.orderBy("key_e12", "doc_id"))
        .cast("long")
        .alias("rnk"),
    )
    return ranked.where("rnk <= 50").select(
        "rnk", "doc_id", "n_chars", "key_e12"
    ).orderBy("rnk")


def _gesd_pick_sql(src: str, excl: tuple[str, ...]) -> str:
    """One generalized-ESD round over the remaining day grid: exact
    integer argmax of |n·x - S| (ties by day), R from the same
    moments — identical expression text in both engines."""
    not_in = (
        " WHERE d NOT IN (" + ", ".join(f"(SELECT d FROM {e})" for e in excl)
        + ")"
        if excl
        else ""
    )
    return f"""
            SELECT d, x, n, s, q,
                   ROUND(CAST(ABS(CAST(n AS HUGEINT) * x - s) AS DOUBLE)
                         / (n * SQRT((CAST(CAST(n AS HUGEINT) * q
                              - CAST(s AS HUGEINT) * s AS DOUBLE))
                              / (CAST(n AS DOUBLE) * n * (n - 1)))), 6)
                       AS r_stat
            FROM (
                SELECT d, x,
                       COUNT(*) OVER () AS n,
                       SUM(x) OVER () AS s,
                       SUM(CAST(x AS HUGEINT) * x) OVER () AS q
                FROM {src}{not_in}
            ) t
            WHERE CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s > 0
              AND n >= 3
            ORDER BY ABS(CAST(n AS HUGEINT) * x - s) DESC, d
            LIMIT 1
    """


@register(
    "dq_outliers_gesd",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        p1 AS ({_gesd_pick_sql("daily", ())}),
        p2 AS ({_gesd_pick_sql("daily", ("p1",))}),
        p3 AS ({_gesd_pick_sql("daily", ("p1", "p2"))})
        SELECT 1 AS round, CAST(d AS VARCHAR) AS removed_day, r_stat
        FROM p1
        UNION ALL SELECT 2, CAST(d AS VARCHAR), r_stat FROM p2
        UNION ALL SELECT 3, CAST(d AS VARCHAR), r_stat FROM p3
        ORDER BY round
    """,
    doc="Generalized ESD (Rosner 1983) outlier ledger over the daily "
    "revenue grid — the ITERATIVE outlier test dq_outlier_iqr cannot "
    "express (ESD re-estimates mean/std after each removal, so one "
    "giant day cannot mask a second): three unrolled rounds, each "
    "picking the EXACT integer argmax of |n·x - S| (n times the "
    "deviation — no float compare decides the pick, day tie-break) "
    "and emitting R_i = |x-mean|/std from the same exact moments as "
    "one fixed float expression; the next round excludes prior picks "
    "and recomputes moments over the remainder (the k-core/markov "
    "certified-ledger discipline applied to a DQ screen). Degenerate "
    "zero-variance or <3-day grids emit fewer rows. Critical values "
    "are the analyst's lookup — the ledger carries the statistics. "
    "Plan at 100 TB: one daily hash agg; each round is a window + "
    "top-1 over the CALENDAR-bounded grid.",
)
def dq_outliers_gesd(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    daily = daily.localCheckpoint()  # calendar-bounded, read 3x
    r_expr = (
        "ROUND(CAST(ABS(CAST(n AS DECIMAL(38,0)) * x - s) AS DOUBLE)"
        " / (n * SQRT((CAST(CAST(n AS DECIMAL(38,0)) * q"
        " - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * n * (n - 1)))), 6)"
    )

    def pick(src: DataFrame) -> DataFrame:
        t = src.select(
            "d",
            "x",
            F.count("*").over(Window.partitionBy()).alias("n"),
            F.sum("x").over(Window.partitionBy()).alias("s"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x"))
            .over(Window.partitionBy())
            .alias("q"),
        )
        return (
            t.where(
                "CAST(n AS DECIMAL(38,0)) * q"
                " - CAST(s AS DECIMAL(38,0)) * s > 0 AND n >= 3"
            )
            .orderBy(
                F.expr("ABS(CAST(n AS DECIMAL(38,0)) * x - s)").desc(),
                "d",
            )
            .limit(1)
            .select("d", F.expr(r_expr).alias("r_stat"))
            # day emitted as ISO string downstream (pandas dtype parity)
        )

    p1 = pick(daily).localCheckpoint()
    rem1 = daily.join(p1, "d", "left_anti")
    p2 = pick(rem1).localCheckpoint()
    rem2 = rem1.join(p2, "d", "left_anti")
    p3 = pick(rem2)
    return (
        p1.select(
            F.lit(1).alias("round"),
            F.col("d").cast("string").alias("removed_day"),
            "r_stat",
        )
        .unionAll(
            p2.select(
                F.lit(2).alias("round"),
                F.col("d").cast("string").alias("removed_day"),
                "r_stat",
            )
        )
        .unionAll(
            p3.select(
                F.lit(3).alias("round"),
                F.col("d").cast("string").alias("removed_day"),
                "r_stat",
            )
        )
        .orderBy("round")
    )


@register(
    "dq_scd2_integrity",
    oracle="""
        WITH scd AS (
            SELECT o_custkey AS k,
                   CAST(o_orderdate AS DATE) AS valid_from,
                   LEAD(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS valid_to
            FROM orders
        ),
        checks AS (
            SELECT k, valid_from, valid_to,
                   LAG(valid_to) OVER (
                       PARTITION BY k ORDER BY valid_from, valid_to)
                       AS prev_to,
                   CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_open
            FROM scd
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_versions,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN prev_to IS NOT NULL
                        AND valid_from < prev_to THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_overlaps,
               CAST(SUM(CASE WHEN prev_to IS NOT NULL
                        AND valid_from > prev_to THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gaps,
               CAST(SUM(is_open) - COUNT(DISTINCT k) AS BIGINT)
                   AS n_extra_open,
               CAST(SUM(CASE WHEN valid_to IS NOT NULL
                        AND valid_to <= valid_from THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inverted
        FROM checks
        HAVING COUNT(*) > 0
    """,
    doc="SCD2 validity-chain integrity audit — the warehouse invariants "
    "every slowly-changing dimension must hold and merge_scd2 "
    "produces but nothing previously VERIFIED: per key, version "
    "windows must not overlap, gaps between consecutive windows are "
    "counted (legal in some designs, a defect in others — reported, "
    "not judged), exactly ONE open (NULL valid_to) row per key, and "
    "no inverted window (to <= from). Here the chain is built from "
    "each customer's order-date history (LEAD = the natural SCD2 "
    "close-out) so the audit exercises the same window shapes as the "
    "real dimension; the same-day re-order edge produces legitimate "
    "inverted/zero-width windows the audit must COUNT, not crash on. "
    "All counts exact integers from two window passes. Plan at "
    "100 TB: both windows partition on the dimension key — one "
    "shuffle, no skew beyond the busiest key.",
)
def dq_scd2_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    wv = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    scd = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.lead(F.col("o_orderdate").cast("date")).over(wv).alias("valid_to"),
    )
    wc = Window.partitionBy("k").orderBy("valid_from", "valid_to")
    checks = scd.select(
        "k",
        "valid_from",
        "valid_to",
        F.lag("valid_to").over(wc).alias("prev_to"),
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).alias("is_open"),
    )
    agg = checks.agg(
        F.count("*").cast("long").alias("n_versions"),
        F.countDistinct("k").cast("long").alias("n_keys"),
        F.sum(
            F.expr(
                "CASE WHEN prev_to IS NOT NULL AND valid_from < prev_to"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_overlaps"),
        F.sum(
            F.expr(
                "CASE WHEN prev_to IS NOT NULL AND valid_from > prev_to"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_gaps"),
        (F.sum("is_open") - F.countDistinct("k")).cast("long").alias(
            "n_extra_open"
        ),
        F.sum(
            F.expr(
                "CASE WHEN valid_to IS NOT NULL AND valid_to <= valid_from"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_inverted"),
    )
    return agg.where("n_versions > 0")
