"""Scalar function surface: string / date / math / JSON / array / map / UDF.

Reference anchors (SURVEY.md §2.1): R12 string formatting
(``/root/reference/dags/exampledag.py:88``), R6 timestamp coercion
(``/root/reference/dags/etl.py:25-29``), R1 JSON payload parsing
(``/root/reference/dags/etl.py:41``), R11 per-element fan-out
(``/root/reference/dags/exampledag.py:92-94`` → explode), R4's
arbitrary-Python transform (``/root/reference/dags/etl.py:48-64`` →
the vectorized pandas_udf escape hatch).

Everything except ``udf_scalar`` is built-in ``pyspark.sql.functions``
— JVM-side, inside whole-stage codegen, no Python in the hot path.
``udf_scalar`` demonstrates the sanctioned slow path: an Arrow-batched
``pandas_udf`` (vectorized; ~10-100× over row-at-a-time Python UDFs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from solarflare_etl_pipeline_spark.catalog import register_views, table
from solarflare_etl_pipeline_spark.registry import register


@register(
    "fn_string",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               SUBSTR(c_name, 1, 8) AS name_prefix,
               c_name || '/' || c_mktsegment AS name_seg,
               LENGTH(c_name) AS name_len,
               REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
               REPLACE(c_mktsegment, 'O', '0') AS seg_leet,
               TRIM(LOWER(c_mktsegment)) AS seg_lower,
               LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded
        FROM customer
    """,
    doc="String built-ins: upper/substr/concat/length/regexp_extract/replace/trim/lpad "
    "(reference R12 formatting generalized).",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_mktsegment"), F.lit("O"), F.lit("0")).alias("seg_leet"),
        F.trim(F.lower("c_mktsegment")).alias("seg_lower"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
    )


@register(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               EXTRACT(YEAR FROM o_orderdate) AS order_year,
               EXTRACT(MONTH FROM o_orderdate) AS order_month,
               EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
               EXTRACT(DAY FROM o_orderdate) AS order_day,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
               DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS TIMESTAMP) AS due_date
        FROM orders
    """,
    doc="Temporal built-ins: extract parts, truncate, date arithmetic "
    "(reference R6's implicit string→timestamp coercion made explicit).",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).cast("timestamp").alias("due_date"),
    )


@register(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice / 3.0, 2) AS third_price,
               ABS(l_discount - 0.05) AS disc_dev,
               CEIL(l_quantity / 7.0) AS qty_ceil,
               FLOOR(l_quantity / 7.0) AS qty_floor,
               CAST(l_quantity AS INT) % 5 AS qty_mod,
               SQRT(l_extendedprice) AS price_sqrt,
               CASE WHEN l_discount > 0.05 THEN 'HIGH'
                    WHEN l_discount > 0.02 THEN 'MID'
                    ELSE 'LOW' END AS disc_band,
               GREATEST(l_tax, l_discount) AS max_rate,
               LEAST(l_tax, l_discount) AS min_rate
        FROM lineitem
    """,
    doc="Arithmetic/rounding/conditional built-ins incl. CASE WHEN banding.",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 3.0, 2).alias("third_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        # Spark CEIL/FLOOR return LONG; DuckDB's on DOUBLE return DOUBLE.
        # Cast so the typed value hash matches (ORACLE_PARITY.md rule 14).
        F.ceil(F.col("l_quantity") / 7.0).cast("double").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7.0).cast("double").alias("qty_floor"),
        (F.col("l_quantity").cast("int") % 5).alias("qty_mod"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.when(F.col("l_discount") > 0.05, "HIGH")
        .when(F.col("l_discount") > 0.02, "MID")
        .otherwise("LOW")
        .alias("disc_band"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "fn_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               json_extract_string(props, '$.missing') AS absent
        FROM events
    """,
    doc="Semi-structured JSON field extraction from events.props "
    "(reference R1's response.json() parsing, dags/etl.py:41).",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@register(
    "fn_array",
    oracle="""
        SELECT doc_id,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
               LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_unique,
               STRING_SPLIT(text, ' ')[1] AS first_token,
               ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), '|') AS sorted_vocab
        FROM documents
    """,
    doc="Array ops over tokenized text: size, distinct, indexing, sort+join "
    "(reference R11 fan-out → array semantics).",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.array_sort(F.array_distinct(toks)), "|").alias("sorted_vocab"),
    )


@register(
    "fn_explode",
    oracle="""
        SELECT token, COUNT(*) AS n
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
        GROUP BY token
    """,
    doc="explode (lateral unnest) + re-aggregate: corpus token frequencies "
    "(reference R11's per-element task fan-out, dags/exampledag.py:92-94).",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@register(
    "fn_map",
    oracle="""
        SELECT event_id, 'event_type' AS prop_key, event_type AS prop_value
        FROM events WHERE event_type IN ('purchase', 'signup')
    """,
    doc="Map construction + explode back to key/value rows (MapType round-trip).",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(F.col("event_type").isin("purchase", "signup"))
    m = F.create_map(F.lit("event_type"), F.col("event_type"))
    return e.select("event_id", F.explode(m).alias("prop_key", "prop_value"))


@register(
    "fn_posexplode",
    oracle="""
        SELECT doc_id,
               UNNEST(RANGE(0, LEN(toks))) AS pos,
               UNNEST(toks) AS token
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
              WHERE doc_id < 20)
    """,
    doc="posexplode: ordinal-preserving flatten (token position matters for n-gram work).",
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@register(
    "fn_string_sim",
    oracle="""
        SELECT a.n_name AS name_a, b.n_name AS name_b,
               levenshtein(a.n_name, b.n_name) AS edit_distance
        FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        WHERE levenshtein(a.n_name, b.n_name) <= 4
    """,
    doc="String similarity: Levenshtein edit distance over name pairs. Blocked "
    "self-join on a length band: edit distance <= 4 implies |len(a)-len(b)| <= 4, "
    "so with width-5 bands a qualifying pair's bands differ by at most 1 — one side "
    "explodes into {band-1, band, band+1} and the join is a hash equi-join on the "
    "band key. Lossless blocking (output identical to the unblocked pairwise "
    "baseline, which is what the oracle runs); pair space at scale is bounded by "
    "the band histogram instead of N².",
)
def fn_string_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    band = F.floor(F.length("n_name") / 5).cast("int")
    # probe side: member of its own band plus both neighbors, so every
    # |Δlen|<=4 pair meets on exactly one equi key
    a = n.select(
        F.col("n_name").alias("name_a"),
        F.col("n_nationkey").alias("ka"),
        F.explode(F.array(band - 1, band, band + 1)).alias("blk"),
    )
    b = n.select(
        F.col("n_name").alias("name_b"),
        F.col("n_nationkey").alias("kb"),
        band.alias("blk"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("ka") < F.col("kb"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_distance") <= 4)
        .select("name_a", "name_b", "edit_distance")
    )


@register(
    "udf_scalar",
    oracle="""
        SELECT event_id, value,
               value * 2.0 + 1.0 AS boosted
        FROM events
    """,
    doc="Vectorized pandas_udf (Arrow-batched) — the sanctioned Python escape hatch "
    "(reference R4's arbitrary-Python transform, dags/etl.py:48-64). Exact double "
    "arithmetic keeps it oracle-checkable; real workloads put model scoring etc. here.",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def boost(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    e = table(spark, sf_dir, "events")
    return e.select("event_id", "value", boost("value").alias("boosted"))


@register(
    "fn_bitwise",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_orderkey << 2 AS key_shl,
               l_orderkey >> 1 AS key_shr,
               l_orderkey & 255 AS key_low_byte,
               l_orderkey | 4096 AS key_or,
               xor(l_orderkey, l_partkey) AS key_xor
        FROM lineitem
        WHERE l_orderkey < 500
    """,
    doc="Bitwise built-ins (shifts, and/or/xor) — integer plumbing for hash "
    "partitioning, bitmask flags, and sketch bit manipulation; all JVM-side "
    "whole-stage codegen.",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.shiftleft("l_orderkey", 2).alias("key_shl"),
        F.shiftright("l_orderkey", 1).alias("key_shr"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("key_low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(4096)).alias("key_or"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
    )


@register(
    "fn_variant",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               'BIGINT' AS k_type,
               json_extract_string(props, '$.nope') AS missing_path,
               CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
        FROM events
    """,
    doc="Semi-structured VARIANT type (Spark 4): events.props parsed ONCE with "
    "parse_json into a binary-encoded variant, fields then extracted with "
    "variant_get path/type expressions — unlike get_json_object (fn_json), "
    "which re-parses the JSON text per extraction, the variant parse cost is "
    "paid once and extractions are cheap binary probes; columnar formats "
    "shred frequently-accessed variant paths into real columns, making this "
    "the 100 TB semi-structured answer. schema_of_variant documents the "
    "inferred shape; try_variant_get returns NULL (never throws) on missing "
    "paths — R1's tolerant field access (dags/etl.py:48-64).",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    return e.select(
        "event_id",
        F.variant_get("v", "$.k", "int").alias("k_int"),
        F.schema_of_variant(F.variant_get("v", "$.k", "variant")).alias("k_type"),
        F.try_variant_get("v", "$.nope", "string").alias("missing_path"),
        (F.variant_get("v", "$.k", "int") % 10).alias("k_bucket"),
    )


@register(
    "fn_url",
    # The fixtures carry no URL column, so a deterministic URL is
    # CONSTRUCTED per document and then parsed back — the operator under
    # test is the parse side (Spark's parse_url, JVM-native); DuckDB
    # restates the extraction with anchored regexes.
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/'
                       || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2'
                       AS url
            FROM documents
        )
        SELECT doc_id, url,
               REGEXP_EXTRACT(url, '^https?://([^/]+)', 1) AS host,
               REGEXP_EXTRACT(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
               REGEXP_EXTRACT(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
               REGEXP_EXTRACT(REGEXP_EXTRACT(url, '^https?://([^/]+)', 1),
                              '^([^.]+)', 1) AS subdomain
        FROM u
    """,
    doc="URL parsing — the first step of every web-corpus pipeline (host-"
    "level dedup, domain quality priors, per-site budgets): parse_url "
    "extracts HOST/PATH/QUERY-param JVM-side (codegen, no regex "
    "compilation per row in Python); the subdomain is the first host "
    "label. Narrow map, scan-speed at any scale; downstream host-level "
    "aggregation is then an ordinary hash shuffle on the extracted "
    "column. The oracle re-derives each part with anchored regexes — "
    "engine-agnostic semantics, not parser internals.",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    host = F.parse_url("url", F.lit("HOST"))
    return u.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.split(host, "\\.").getItem(0).alias("subdomain"),
    )


@register(
    "fn_minmax_scale",
    oracle="""
        WITH q AS (
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        ext AS (
            SELECT event_type,
                   MIN(v3) AS lo3, MAX(v3) AS hi3
            FROM q GROUP BY 1
        )
        SELECT q.event_id, q.event_type,
               CAST((q.v3 - ext.lo3) * 1000000 // (ext.hi3 - ext.lo3) AS BIGINT)
                   AS scaled_ppm
        FROM q JOIN ext USING (event_type)
        WHERE ext.hi3 > ext.lo3
    """,
    doc="Per-group min-max feature scaling — the normalize-to-[0,1] prep "
    "step of any ML feature pipeline, done exactly: values are milli-"
    "quantized (deterministic FLOOR), per-type extrema come from one "
    "partial+final agg (a |types|-row table, broadcast back), and the "
    "scaled position is the integer ppm (v-lo)*1e6 DIV (hi-lo) — no "
    "float division, hash-exact. Degenerate groups (hi == lo) are "
    "excluded rather than divided by zero. Plan: scan + tiny-agg + "
    "broadcast join + narrow map — no data-sized shuffle at all; at "
    "100 TB the extrema table stays |types|-sized and the scale pass "
    "runs at scan speed.",
)
def fn_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    q = e.select(
        "event_id", "event_type", F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3")
    )
    ext = q.groupBy("event_type").agg(
        F.min("v3").alias("lo3"), F.max("v3").alias("hi3")
    )
    return (
        q.join(F.broadcast(ext), "event_type")
        .where(F.col("hi3") > F.col("lo3"))
        .select(
            "event_id",
            "event_type",
            F.expr("CAST((v3 - lo3) * 1000000 DIV (hi3 - lo3) AS BIGINT)").alias(
                "scaled_ppm"
            ),
        )
    )


@register(
    "fn_safe_arith",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice / NULLIF(l_quantity, 0) AS unit_price,
               l_quantity / NULLIF(l_discount, 0) AS qty_per_disc,
               COALESCE(l_extendedprice / NULLIF(l_quantity, 0), 0.0)
                   AS unit_price_or_zero
        FROM lineitem
    """,
    doc="Error-safe arithmetic (ANSI-mode division that yields NULL "
    "instead of failing the job): Spark's try_divide is the ANSI-"
    "compliant escape hatch — one poisoned row (zero denominator) must "
    "not kill a 100 TB job; the oracle states the equivalent "
    "x / NULLIF(y, 0) algebra. The division COPIES IEEE semantics on "
    "the same operands in both engines (single op, no accumulation — "
    "no rule-16 detour needed), and the COALESCE column shows the "
    "sentinel-fill idiom downstream aggregates want. Narrow map, "
    "scan-speed, no shuffle.",
)
def fn_safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_quantity").alias("unit_price"),
        F.try_divide("l_quantity", "l_discount").alias("qty_per_disc"),
        F.coalesce(
            F.try_divide("l_extendedprice", "l_quantity"), F.lit(0.0)
        ).alias("unit_price_or_zero"),
    )


@register(
    "fn_timezone",
    oracle="""
        WITH conv AS (
            SELECT event_id,
                   CAST(ts AS TIMESTAMP) AS ts_utc,
                   CAST(timezone('America/New_York',
                        CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
                        AS TIMESTAMP) AS local_ny,
                   CAST(timezone('Australia/Lord_Howe',
                        CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
                        AS TIMESTAMP) AS local_lordhowe,
                   CAST(timezone('Asia/Kolkata',
                        CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
                        AS TIMESTAMP) AS local_kolkata
            FROM events
        )
        SELECT event_id, ts_utc, local_ny, local_lordhowe, local_kolkata,
               CAST((EPOCH_US(local_ny) - EPOCH_US(ts_utc)) // 60000000
                    AS BIGINT) AS offset_min_ny,
               CAST((EPOCH_US(local_lordhowe) - EPOCH_US(ts_utc)) // 60000000
                    AS BIGINT) AS offset_min_lordhowe,
               CAST(ISODOW(local_ny) AS INT) AS ny_isodow,
               CAST(HOUR(local_ny) AS INT) AS ny_hour,
               ISODOW(local_ny) <= 5 AND HOUR(local_ny) BETWEEN 9 AND 16
                   AS is_ny_business_hours
        FROM conv
    """,
    doc="IANA timezone conversion — the calendar correctness layer "
    "fn_date/fn_date_format omit: UTC event instants rendered in three "
    "deliberately awkward zones (America/New_York: negative offset + "
    "DST; Australia/Lord_Howe: +10:30 base with a HALF-HOUR DST step, "
    "active during the fixture's January so the emitted offset is "
    "+11:00; Asia/Kolkata: permanent +5:30 — the zones that break "
    "every hand-rolled hour-offset hack), plus derived local business "
    "calendars (ISO weekday, local hour, business-hours flag) and the "
    "realized offset in minutes computed from the epoch difference — "
    "so a DST transition inside the data range would surface as a "
    "mixed-offset group. Spark's from_utc_timestamp and DuckDB's "
    "timezone() both delegate to the host IANA tzdb and agree to the "
    "microsecond across DST edges (spring-forward skip and fall-back "
    "repeat pinned in tests/test_semantics.py); the oracle interprets "
    "instants via AT TIME ZONE 'UTC' so it is immune to the oracle "
    "session's TimeZone setting. Narrow map over the scan — zero "
    "shuffle at any scale; the practical 100 TB use is localizing "
    "event time before per-market daily rollups, where doing it wrong "
    "by a fixed offset misbuckets every row within DST of a "
    "boundary.",
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    lh = F.from_utc_timestamp("ts", "Australia/Lord_Howe")
    kk = F.from_utc_timestamp("ts", "Asia/Kolkata")
    off_ny = ((F.unix_micros(ny) - F.unix_micros(F.col("ts").cast("timestamp"))) / F.lit(60000000)).cast("long")
    off_lh = ((F.unix_micros(lh) - F.unix_micros(F.col("ts").cast("timestamp"))) / F.lit(60000000)).cast("long")
    isodow = (F.weekday(ny) + 1).cast("int")
    return e.select(
        "event_id",
        F.col("ts").alias("ts_utc"),
        ny.alias("local_ny"),
        lh.alias("local_lordhowe"),
        kk.alias("local_kolkata"),
        off_ny.alias("offset_min_ny"),
        off_lh.alias("offset_min_lordhowe"),
        isodow.alias("ny_isodow"),
        F.hour(ny).cast("int").alias("ny_hour"),
        ((F.weekday(ny) + 1 <= 5) & F.hour(ny).between(9, 16)).alias(
            "is_ny_business_hours"
        ),
    )


@register(
    "fn_winsorize",
    oracle="""
        WITH q AS (
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        fences AS (
            SELECT event_type,
                   QUANTILE_CONT(v3, 0.25) - 1.5 *
                       (QUANTILE_CONT(v3, 0.75) - QUANTILE_CONT(v3, 0.25))
                       AS lo_fence,
                   QUANTILE_CONT(v3, 0.75) + 1.5 *
                       (QUANTILE_CONT(v3, 0.75) - QUANTILE_CONT(v3, 0.25))
                       AS hi_fence
            FROM q GROUP BY event_type
        )
        SELECT q.event_id, q.event_type, q.v3,
               GREATEST(f.lo_fence, LEAST(f.hi_fence, CAST(q.v3 AS DOUBLE)))
                   AS v3_winsorized,
               q.v3 < f.lo_fence OR q.v3 > f.hi_fence AS was_clipped
        FROM q JOIN fences f USING (event_type)
    """,
    doc="Winsorization at Tukey fences — the clip-the-tails feature-"
    "prep step (robust alternative to z-score clipping; the WRITE "
    "counterpart of ts_mad_outliers/ts_rolling_robust, which only "
    "FLAG): per-type interquartile fences (q1/q3 at dyadic quarter "
    "fractions on milli-quantized BIGINTs, so every fence is an exact "
    "double and the clip compare never sits on a rounding edge), "
    "values clamped into [q1-1.5*IQR, q3+1.5*IQR] with a was_clipped "
    "audit flag. Plan: one per-type percentile aggregate (a |types|-"
    "row table, broadcast back) + a narrow clamp map — no data-sized "
    "shuffle; at 100 TB swap the exact percentile for "
    "approx_percentile (mergeable sketch, same plan shape) when types "
    "carry billions of rows each.",
)
def fn_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    q = e.select(
        "event_id",
        "event_type",
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    q1 = F.percentile("v3", F.lit(0.25))
    q3 = F.percentile("v3", F.lit(0.75))
    fences = q.groupBy("event_type").agg(
        (q1 - 1.5 * (q3 - q1)).alias("lo_fence"),
        (q3 + 1.5 * (q3 - q1)).alias("hi_fence"),
    )
    v = F.col("v3").cast("double")
    return q.join(F.broadcast(fences), "event_type").select(
        "event_id",
        "event_type",
        "v3",
        F.greatest(F.col("lo_fence"), F.least(F.col("hi_fence"), v)).alias(
            "v3_winsorized"
        ),
        ((v < F.col("lo_fence")) | (v > F.col("hi_fence"))).alias("was_clipped"),
    )


@register(
    "fn_quantile_align",
    oracle="""
        WITH q AS (
            SELECT event_id, event_type,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v3
            FROM events
        ),
        bucketed AS (
            SELECT event_id, event_type, v3,
                   CAST(NTILE(64) OVER (PARTITION BY event_type
                        ORDER BY v3, event_id) AS INT) AS b
            FROM q
        ),
        pooled AS (
            SELECT v3,
                   CAST(ROW_NUMBER() OVER (ORDER BY v3, event_id) AS BIGINT)
                       AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM q
        ),
        ref AS (
            SELECT k, MAX(v3) AS ref_v3
            FROM pooled, UNNEST(range(1, 65)) AS t(k)
            WHERE rn * 64 <= n * k
            GROUP BY k
        )
        SELECT bk.event_id, bk.event_type, bk.v3, bk.b AS bucket,
               r.ref_v3 AS v3_aligned
        FROM bucketed bk JOIN ref r ON r.k = bk.b
    """,
    doc="Quantile normalization — align every segment's value "
    "distribution to the POOLED reference (the microarray-normalization "
    "/ feature-calibration move: after alignment, every event_type has "
    "the same marginal distribution, so cross-segment models stop "
    "learning segment identity from scale): each row gets its within-"
    "type 64-quantile bucket (NTILE with the event_id tiebreak), the "
    "pooled reference value per bucket is an EXACT ORDER STATISTIC "
    "(max value with rn*64 <= n*k — same rank arithmetic as "
    "dq_qq_drift, zero float ops end to end), and the aligned value "
    "is a 64-row broadcast-join lookup. Everything is BIGINT — hash-"
    "exact by construction. Plan (r7 rewrite, no single-task sorts): "
    "the per-type NTILE runs as a distributed exact rank (range-"
    "repartition + per-partition row_number + bounded offset join, "
    "plans/rank.py) + pure NTILE arithmetic, and the pooled cut "
    "points come from the cumulative distinct-value grid (bounded by "
    "the x1000 discretization) — both provably identical to the "
    "oracle's window spellings, both skew-proof at 100 TB.",
)
def fn_quantile_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from solarflare_etl_pipeline_spark.plans.rank import exact_ntile, with_grouped_rank

    e = table(spark, sf_dir, "events")
    q = e.select(
        "event_id",
        "event_type",
        F.expr("CAST(FLOOR(value * 1000) AS BIGINT)").alias("v3"),
    )
    # r7 rewrite: the oracle's NTILE over a low-cardinality partitionBy
    # (|event_type| tasks) becomes a distributed exact rank (range-
    # repartition + bounded offsets, plans/rank.py) + NTILE arithmetic —
    # identical buckets, no single-task sort.
    bucketed = with_grouped_rank(
        q, ["event_type"], ["v3", "event_id"], "rn", group_total_col="nt"
    ).select(
        "event_id",
        "event_type",
        "v3",
        exact_ntile(F.col("rn"), F.col("nt"), 64).cast("int").alias("bucket"),
    )
    # Pooled reference cut points via the cumulative DISTINCT-VALUE grid
    # (the dq_qq_drift discipline — grid size bounded by the x1000
    # discretization, not by row count): value at pooled rank
    # t_k = (n*k) DIV 64 is the smallest grid value whose cumulative
    # count reaches t_k (the event_id tiebreak cannot change which
    # VALUE sits at a given rank).
    hist = q.groupBy("v3").agg(F.count("*").cast("long").alias("cnt"))
    grid = hist.select(
        "v3",
        F.sum("cnt").over(W.orderBy("v3")).cast("long").alias("cum"),
        F.sum("cnt").over(W.partitionBy()).cast("long").alias("n"),
    )
    ref = (
        grid.select(
            "v3", "cum", "n", F.explode(F.sequence(F.lit(1), F.lit(64))).alias("k")
        )
        .where(
            (F.col("cum") >= F.expr("(n * k) DIV 64"))
            & (F.expr("(n * k) DIV 64") >= F.lit(1))
        )
        .groupBy("k")
        .agg(F.min("v3").alias("ref_v3"))
    )
    return bucketed.join(
        F.broadcast(ref.withColumnRenamed("k", "bucket")), "bucket"
    ).select("event_id", "event_type", "v3", "bucket", F.col("ref_v3").alias("v3_aligned"))


#: A deliberately RE2-safe pattern (no backrefs/lookaround — Java regex
#: and DuckDB's RE2 agree on this subset): engine-architecture words.
REGEX_PATTERN = r"\b(scan|sort|merge|hash|join)\b"


@register(
    "fn_regex_extract_all",
    oracle=r"""
        SELECT doc_id,
               CAST(UNNEST(RANGE(0, LEN(toks))) AS BIGINT) AS match_idx,
               UNNEST(toks) AS match
        FROM (
            SELECT doc_id,
                   REGEXP_EXTRACT_ALL(text, '\b(scan|sort|merge|hash|join)\b')
                       AS toks
            FROM documents
        )
    """,
    doc="Log/text field extraction via regexp_extract_all + ordinal "
    "explode — the parse-the-unstructured-column workhorse (access "
    "logs, stack traces, markup). The pattern is restricted to the "
    "RE2-safe subset (alternation, word boundaries — no backrefs or "
    "lookaround) so Java regex (Spark) and RE2 (DuckDB) provably "
    "agree; the oracle replays the same extraction, certifying "
    "dialect-compatible semantics plus ordinal stability through "
    "posexplode. Per-row narrow work: no shuffle, codegen'd, "
    "parallelism = input partitions — the ideal 100 TB shape.",
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.expr(f"regexp_extract_all(text, r'{REGEX_PATTERN}', 0)")).alias(
            "match_idx", "match"
        ),
    ).select("doc_id", F.col("match_idx").cast("long").alias("match_idx"), "match")


@register(
    "fn_base64_codec",
    oracle="""
        SELECT doc_id,
               base64(encode(text)) AS b64,
               LENGTH(base64(encode(text))) AS b64_len,
               decode(from_base64(base64(encode(text)))) = text AS roundtrip_ok
        FROM documents
    """,
    doc="Base64 encode/decode round trip over document text — the "
    "binary-payload transport codec (webhooks, JSON-embedded blobs, "
    "key material). Found while building this op: Spark's base64() "
    "emits MIME-CHUNKED output (a CRLF every 76 chars, "
    "java.util.Base64.getMimeEncoder) while DuckDB emits unwrapped "
    "RFC 4648 — byte-identical only after stripping CRLF, which the "
    "Spark side does explicitly (and unbase64 accepts both). Narrow "
    "per-row work, codegen'd, no shuffle.",
)
def fn_base64_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # normalize Spark's MIME chunking to RFC 4648 (no line breaks)
    b64 = F.replace(
        F.base64(F.encode("text", "UTF-8")), F.lit("\r\n"), F.lit("")
    )
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.length(b64).alias("b64_len"),
        (F.decode(F.unbase64(b64), "UTF-8") == F.col("text")).alias("roundtrip_ok"),
    )


@register(
    "fn_business_days",
    oracle="""
        WITH j AS (
            SELECT l.l_orderkey, l.l_linenumber,
                   CAST(o.o_orderdate AS DATE) AS d1,
                   CAST(l.l_shipdate AS DATE) AS d2
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        z AS (
            SELECT l_orderkey, l_linenumber, d1, d2,
                   DATE_DIFF('day', DATE '1970-01-05', d1) AS z1,
                   DATE_DIFF('day', DATE '1970-01-05', d2) AS z2
            FROM j
        )
        SELECT l_orderkey, l_linenumber,
               CAST(d1 AS TIMESTAMP) AS order_date,
               CAST(d2 AS TIMESTAMP) AS ship_date,
               CAST(z2 - z1 AS BIGINT) AS calendar_days,
               CAST(((z2 // 7) * 5 + LEAST(z2 % 7 + 1, 5))
                    - ((z1 // 7) * 5 + LEAST(z1 % 7 + 1, 5))
                    AS BIGINT) AS business_days
        FROM z
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="Business-day (weekday) span between order and ship date per "
    "lineitem — the SLA arithmetic every fulfillment report needs, "
    "computed CLOSED-FORM with zero calendar-table joins: with z = "
    "days since 1970-01-05 (a Monday), g(z) = (z DIV 7)*5 + "
    "LEAST(z MOD 7 + 1, 5) counts weekdays from the epoch through "
    "day z, and the span is g(z2) - g(z1) — pure integer "
    "arithmetic, identical in any engine, valid for any date pair "
    "in either order (g is monotone), no row explosion (the "
    "gen_calendar_dim alternative explodes one row per day per "
    "span, ~30x here). Fixture dates are all post-1970 so z >= 0 "
    "and DIV/MOD agree across engines; for pre-1970 dates shift "
    "the epoch anchor earlier. Plan: one orderkey equi join, "
    "all-narrow projection after it.",
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_linenumber",
        F.col("o_orderdate").cast("date").alias("d1"),
        F.col("l_shipdate").cast("date").alias("d2"),
    )
    z = j.select(
        "l_orderkey",
        "l_linenumber",
        "d1",
        "d2",
        F.datediff(F.col("d1"), F.lit("1970-01-05").cast("date")).alias("z1"),
        F.datediff(F.col("d2"), F.lit("1970-01-05").cast("date")).alias("z2"),
    )
    g1 = F.expr("(z1 DIV 7) * 5 + LEAST(z1 % 7 + 1, 5)")
    g2 = F.expr("(z2 DIV 7) * 5 + LEAST(z2 % 7 + 1, 5)")
    return z.select(
        "l_orderkey",
        "l_linenumber",
        F.col("d1").cast("timestamp").alias("order_date"),
        F.col("d2").cast("timestamp").alias("ship_date"),
        (F.col("z2") - F.col("z1")).cast("long").alias("calendar_days"),
        (g2 - g1).cast("long").alias("business_days"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "fn_date_parts2",
    # Cross-engine alignments: Spark dayofweek is 1=Sunday..7 while
    # DuckDB dayofweek is 0=Sunday..6 (oracle adds 1); Spark
    # add_months/last_day return DATE while DuckDB interval arithmetic
    # stays TIMESTAMP (both sides cast to TIMESTAMP — end-of-month
    # clamping agrees: Jan 31 + 1 month = Feb 28 in both); next_day has
    # no DuckDB twin, so the oracle derives it from isodow arithmetic
    # (smallest date STRICTLY after with isodow=1).
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 2 MONTH AS TIMESTAMP)
                   AS plus_2_months,
               CAST(LAST_DAY(o_orderdate) AS TIMESTAMP) AS month_end,
               CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
               CAST(WEEKOFYEAR(o_orderdate) AS BIGINT) AS iso_week,
               CAST(DAYOFYEAR(o_orderdate) AS BIGINT) AS day_of_year,
               CAST(o_orderdate
                    + CAST(((7 - ISODOW(o_orderdate)) % 7) + 1 AS INTEGER)
                      * INTERVAL 1 DAY AS TIMESTAMP) AS next_monday,
               CAST(DATE_TRUNC('quarter', o_orderdate) AS TIMESTAMP)
                   AS quarter_start
        FROM orders
        WHERE o_orderkey < 500
    """,
    doc="Calendar arithmetic built-ins beyond fn_date's extract family: "
    "add_months (end-of-month clamped — the fiscal-offset workhorse), "
    "last_day (period-end anchoring), dayofweek/weekofyear/dayofyear "
    "(ISO week for weekly rollups), next_day (the 'following Monday' "
    "scheduling primitive), and quarter truncation. All JVM-side "
    "whole-stage codegen; engine skews (Sunday-origin vs ISO "
    "day-of-week numbering, DATE vs TIMESTAMP returns, the missing "
    "DuckDB next_day) are aligned in the oracle per the docstring "
    "notes — the exact class of dialect trap ORACLE_PARITY.md rule 9 "
    "catalogs. Narrow projection, no shuffle.",
)
def fn_date_parts2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 2).cast("timestamp").alias("plus_2_months"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.dayofweek("o_orderdate").cast("long").alias("dow_sun1"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.dayofyear("o_orderdate").cast("long").alias("day_of_year"),
        F.next_day("o_orderdate", "Mon").cast("timestamp").alias("next_monday"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


@register(
    "udf_arrow_map",
    oracle="""
        SELECT doc_id,
               LENGTH(text) AS n_chars_arrow,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens_arrow
        FROM documents
        WHERE text IS NOT NULL
    """,
    doc="Arrow-NATIVE map (mapInArrow): batches arrive as "
    "pyarrow.RecordBatch iterators and are transformed with "
    "pyarrow.compute kernels — the zero-copy sibling of mapInPandas "
    "(no pandas Series materialization) and the third point of the "
    "Python-boundary API surface next to udf_scalar (Arrow "
    "pandas_udf) and udaf_arrow_grouped (applyInArrow). Character "
    "and whitespace-token counts via utf8_length / split_pattern + "
    "list_value_length — trivially SQL-expressible on purpose, so "
    "the whole Arrow path is oracle-certified; the real use is "
    "Arrow-binding libraries (tokenizers, image codecs) where the "
    "data never needs Python objects. Narrow map, batch-streamed, "
    "no shuffle.",
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_stats(batches):
        for b in batches:
            text = b.column("text")
            yield pa.record_batch(
                {
                    "doc_id": b.column("doc_id"),
                    "n_chars_arrow": pc.cast(pc.utf8_length(text), pa.int32()),
                    "n_tokens_arrow": pc.list_value_length(
                        pc.split_pattern(text, " ")
                    ),
                }
            )

    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    return d.mapInArrow(
        batch_stats, schema="doc_id long, n_chars_arrow int, n_tokens_arrow int"
    )


@register(
    "fn_sql_udf",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                        WHEN o_totalprice < 150000 THEN 'mid'
                        ELSE 'high' END AS band,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        )
        SELECT band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM b GROUP BY band ORDER BY band
    """,
    doc="SQL scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURNS ... "
    "RETURN expr — first-class in Spark 4.0): the right way to "
    "package reusable business logic WITHOUT leaving the JVM — the "
    "function body is inlined into the Catalyst plan at resolution "
    "time, so it constant-folds, participates in whole-stage "
    "codegen, and never blocks predicate pushdown (EXPLAIN shows "
    "the call replaced by its expression — probed in-repo: a "
    "constant call folds to a literal). Contrast udf_scalar (Arrow "
    "Python — a real serialization boundary) — reaching for Python "
    "when the logic is expressible as SQL is the #1 avoidable 100 TB "
    "cost. Here: an integer-cents money normalizer + a price-band "
    "classifier, composed in an aggregate; the oracle inlines the "
    "same expressions (DuckDB macros would be its equivalent).",
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION money_cents(x DOUBLE)"
        " RETURNS BIGINT RETURN CAST(ROUND(x * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(x DOUBLE)"
        " RETURNS STRING RETURN CASE WHEN x < 50000 THEN 'low'"
        " WHEN x < 150000 THEN 'mid' ELSE 'high' END"
    )
    return spark.sql(
        """
        SELECT price_band(o_totalprice) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(money_cents(o_totalprice)) AS BIGINT) AS sum_cents
        FROM orders
        GROUP BY price_band(o_totalprice)
        ORDER BY band
        """
    )


@register(
    "fn_month_end_rollover",
    # 'Same day next month' is NOT engine-portable through add_months:
    # Spark (Hive lineage) preserves end-of-month (Apr 30 + 1 month ->
    # May 31) while DuckDB's + INTERVAL clamps only on overflow (->
    # May 30). The billing-date semantics are therefore spelled
    # explicitly — month-start + 1 month (day 1 never clamps and
    # triggers no EOM rule in either engine) and a manual
    # LEAST(day, days-in-next-month) clamp — so both engines compute
    # the SAME well-defined rollover rather than their own quirk.
    oracle="""
        WITH d AS (
            SELECT DISTINCT CAST(o_orderdate AS DATE) AS od FROM orders
        ),
        m AS (
            SELECT od,
                   EXTRACT(DAY FROM od) AS day_of_month,
                   LAST_DAY(od) AS eom,
                   CAST(DATE_TRUNC('month', od) + INTERVAL 1 MONTH
                        AS DATE) AS nms
            FROM d
        )
        SELECT CAST(od AS TIMESTAMP) AS order_date,
               CAST(day_of_month AS BIGINT) AS day_of_month,
               od = eom AS is_month_end,
               CAST(eom AS TIMESTAMP) AS month_end,
               CAST(EXTRACT(DAY FROM eom) AS BIGINT) AS days_in_month,
               CAST(nms + (LEAST(day_of_month,
                                 EXTRACT(DAY FROM LAST_DAY(nms))) - 1)
                        * INTERVAL 1 DAY AS TIMESTAMP) AS billing_next
        FROM m
        ORDER BY order_date
    """,
    doc="Month-end rollover semantics certified portably: for each "
    "distinct order date, the day-of-month, end-of-month flag/date, "
    "days-in-month, and the 'same day next month, clamped to month "
    "length' billing date that subscription/invoice pipelines need "
    "(Jan 31 -> Feb 28, Apr 30 -> May 30 — NOT Spark add_months' "
    "silent end-of-month preservation, which is documented here as "
    "the reason the clamp is spelled manually; an engine migration "
    "that relied on add_months would silently shift ~3/31sts of "
    "month-end billing dates). Output is the distinct-date grid — "
    "calendar-bounded regardless of corpus size; one distinct "
    "shuffle at 100 TB.",
)
def fn_month_end_rollover(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderdate").cast("date").alias("od")).distinct()
    m = d.select(
        "od",
        F.dayofmonth("od").cast("long").alias("day_of_month"),
        F.last_day("od").alias("eom"),
        F.add_months(F.date_trunc("month", F.col("od")).cast("date"), 1)
        .alias("nms"),
    )
    clamp_day = F.least(
        F.col("day_of_month"), F.dayofmonth(F.last_day("nms")).cast("long")
    )
    return m.select(
        F.col("od").cast("timestamp").alias("order_date"),
        "day_of_month",
        (F.col("od") == F.col("eom")).alias("is_month_end"),
        F.col("eom").cast("timestamp").alias("month_end"),
        F.dayofmonth("eom").cast("long").alias("days_in_month"),
        F.date_add(F.col("nms"), (clamp_day - 1).cast("int"))
        .cast("timestamp")
        .alias("billing_next"),
    ).orderBy("order_date")


def _soundex_sql(col: str, g: str) -> str:
    """The portable Soundex chain as ONE SQL expression — identical
    algorithm in both engines; ``g`` is the regexp_replace global-flag
    argument spelling (DuckDB needs an explicit ``, 'g'``; Spark
    replaces all matches by default). No backreferences anywhere:
    DuckDB's RE2 has none, so duplicate runs collapse via six
    per-digit ``d{{2,}}`` replaces."""
    u = f"UPPER({col})"
    # code the WHOLE word (first letter included), H/W removed first so
    # duplicates across them collapse (the Pfister rule)
    coded = f"REGEXP_REPLACE({u}, '[HW]', ''{g})"
    for cls, d in (
        ("[BFPV]", "1"),
        ("[CGJKQSXZ]", "2"),
        ("[DT]", "3"),
        ("[L]", "4"),
        ("[MN]", "5"),
        ("[R]", "6"),
        ("[AEIOUY]", "0"),
    ):
        coded = f"REGEXP_REPLACE({coded}, '{cls}', '{d}'{g})"
    for d in "0123456":
        coded = f"REGEXP_REPLACE({coded}, '{d}{{2,}}', '{d}'{g})"
    tail = f"REPLACE(SUBSTR({coded}, 2), '0', '')"
    return f"CONCAT(SUBSTR({u}, 1, 1), SUBSTR(CONCAT({tail}, '000'), 1, 3))"


@register(
    "fn_soundex_blocking",
    oracle=f"""
        WITH words AS (
            SELECT UNNEST(STRING_SPLIT(p_name, ' ')) AS word
            FROM part
        ),
        wc AS (
            SELECT word, COUNT(*) AS n_parts FROM words GROUP BY word
        )
        SELECT word, {_soundex_sql('word', ", 'g'")} AS soundex_code,
               n_parts
        FROM wc
        ORDER BY word
    """,
    doc="Soundex phonetic blocking keys over the part-name vocabulary — "
    "the classic entity-resolution blocking function (candidate pairs "
    "for fuzzy matching come from equal phonetic codes, turning an "
    "O(n^2) fuzzy join into per-block joins; the phonetic complement "
    "of fn_string_sim's edit distances). The American-Soundex chain "
    "(keep first letter; drop H/W so duplicates across them collapse; "
    "code consonant classes 1-6, vowels 0; collapse runs; strip "
    "zeros; pad to letter+3) is spelled as ONE identical "
    "regexp_replace chain in both engines — no backreferences, since "
    "DuckDB's RE2 has none, so runs collapse via per-digit d{2,} "
    "replaces; Spark's builtin soundex() is deliberately NOT used — "
    "only one engine has it, and a hash-certified op needs the SAME "
    "spelled-out algorithm on both sides (the chain reproduces the "
    "textbook test vectors incl. the H/W rule: Ashcraft->A261, "
    "Pfister->P236, Tymczak->T522 — pinned in "
    "tests/test_stats_rederivation.py). Scalar chain "
    "per row + one word-count aggregate — embarrassingly parallel "
    "at any scale.",
)
def fn_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    words = p.select(F.explode(F.split("p_name", " ")).alias("word"))
    wc = words.groupBy("word").agg(F.count("*").alias("n_parts"))
    return wc.select(
        "word",
        F.expr(_soundex_sql("word", "")).alias("soundex_code"),
        "n_parts",
    ).orderBy("word")


@register(
    "fn_variant_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(j, '$.meta.k') AS BIGINT) AS meta_k,
               json_extract_string(j, '$.type') AS etype,
               CAST(json_extract_string(j, '$.v') AS BIGINT) AS v3,
               json_extract_string(j, '$.meta.absent') AS missing_path,
               TRY_CAST(json_extract_string(j, '$.type') AS BIGINT)
                   AS bad_cast
        FROM (
            SELECT event_id,
                   '{"meta":' || props || ',"type":"' || event_type
                       || '","v":' || CAST(CAST(FLOOR(value * 1000)
                                          AS BIGINT) AS VARCHAR) || '}'
                       AS j
            FROM events
        )
    """,
    doc="Spark 4 VARIANT ingestion — the modern engine path for "
    "semi-structured columns that fn_json's get_json_object predates: "
    "a nested JSON document (built in-row from props + typed columns, "
    "so the fixture exercises REAL nesting) is parsed ONCE into a "
    "VARIANT value (binary-encoded, no per-access re-parse — the "
    "whole point vs string JSON at 100 TB: parse cost paid once per "
    "row, every later path access is a tree walk) and fields come "
    "out through typed variant_get paths: a nested BIGINT, a top "
    "string, a missing path (NULL, not an error), and a deliberate "
    "type-mismatch through try_variant_get (NULL, the TRY_CAST "
    "contract). The DuckDB oracle replays the same paths with "
    "json_extract_string + TRY_CAST, certifying path semantics and "
    "NULL/cast behavior cross-engine. Per-row narrow work: no "
    "shuffle, codegen'd, parallelism = input partitions.",
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    j = (
        "CONCAT('{\"meta\":', props, ',\"type\":\"', event_type,"
        " '\",\"v\":', CAST(CAST(FLOOR(value * 1000) AS BIGINT)"
        " AS STRING), '}')"
    )
    return e.select(
        "event_id",
        F.expr(
            f"variant_get(parse_json({j}), '$.meta.k', 'bigint')"
        ).alias("meta_k"),
        F.expr(
            f"variant_get(parse_json({j}), '$.type', 'string')"
        ).alias("etype"),
        F.expr(f"variant_get(parse_json({j}), '$.v', 'bigint')").alias(
            "v3"
        ),
        F.expr(
            f"variant_get(parse_json({j}), '$.meta.absent', 'string')"
        ).alias("missing_path"),
        F.expr(
            f"try_variant_get(parse_json({j}), '$.type', 'bigint')"
        ).alias("bad_cast"),
    )


@register(
    "fn_collation_group",
    oracle="""
        WITH toks AS (
            SELECT doc_id, pos, tok,
                   CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '#'
                        || CAST(pos AS VARCHAR)), 1, 2)) AS BIGINT) % 3 AS sel
            FROM (
                SELECT doc_id,
                       UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) + 1)) AS pos,
                       UNNEST(STRING_SPLIT(text, ' ')) AS tok
                FROM documents
            )
        ),
        cased AS (
            SELECT CASE sel
                       WHEN 0 THEN tok
                       WHEN 1 THEN UPPER(tok)
                       ELSE UPPER(SUBSTR(tok, 1, 1)) || SUBSTR(tok, 2)
                   END AS w
            FROM toks
        )
        SELECT LOWER(w) AS token,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_case_variants
        FROM cased
        GROUP BY LOWER(w)
    """,
    doc="Spark 4 COLLATION surface under the driver hash: tokens are "
    "given deterministic case variants (md5-selected per (doc_id, pos): "
    "as-is / UPPER / leading-capital — the same arithmetic on both "
    "engines), then grouped under the UTF8_LCASE collation via "
    "F.collate — the first-class case-insensitive path Spark 4 added, "
    "certified against a LOWER()-grouping DuckDB oracle (same result "
    "set by collation semantics; n_case_variants > 1 rows prove the "
    "collation actually merged distinct binary strings, not just "
    "re-grouped identical ones). The output token is emitted through "
    "LOWER(CAST(.. AS STRING)) because the group representative under "
    "a collation is engine-chosen. At 100 TB the point of the "
    "collation path is that the scan groups/joins case-insensitively "
    "WITHOUT materializing a second lowercased copy of the key column "
    "(the comparison happens in the collation-aware codegen'd "
    "comparator), and collated group keys shuffle-partition "
    "consistently — same two-shuffle hash-agg plan as any groupBy.",
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    sel = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("#"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("long")
        % 3
    )
    cased = toks.select(
        F.when(sel == 0, F.col("tok"))
        .when(sel == 1, F.upper("tok"))
        .otherwise(
            F.concat(
                F.upper(F.substring("tok", 1, 1)), F.expr("SUBSTR(tok, 2)")
            )
        )
        .alias("w")
    )
    return (
        cased.groupBy(F.collate(F.col("w"), "UTF8_LCASE").alias("ck"))
        .agg(
            # the un-collated w is still in scope inside the aggregate:
            # its binary-comparator MIN is a deterministic group
            # representative (the collated key itself is engine-chosen),
            # and its DISTINCT count proves the collation merged
            # genuinely different binary strings
            F.lower(F.min("w")).alias("token"),
            F.count("*").cast("long").alias("n"),
            F.count_distinct("w").cast("long").alias("n_case_variants"),
        )
        .select("token", "n", "n_case_variants")
    )


@register(
    "fn_ansi_try_ops",
    oracle="""
        WITH x AS (
            SELECT l_orderkey,
                   CAST(l_linenumber % 3 AS BIGINT) AS den,
                   CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
                   9223372036854775807 - 1000
                     + (l_orderkey % 2000) AS addend_guarded,
                   CASE WHEN l_orderkey % 2000 > 1000
                        THEN NULL
                        ELSE 9223372036854775807 - 1000
                             + (l_orderkey % 2000) END AS add_res,
                   CASE WHEN l_linenumber % 2 = 0
                        THEN CAST(l_orderkey AS VARCHAR)
                        ELSE l_returnflag END AS casty
            FROM lineitem
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN den = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_div_null,
               CAST(SUM(CASE WHEN den > 0 THEN cents // den END) AS BIGINT)
                 AS sum_div_floor,
               CAST(SUM(CASE WHEN add_res IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_add_overflow,
               CAST(SUM(add_res % 1000003) AS BIGINT) AS add_ok_mod_sum,
               CAST(SUM(CASE WHEN TRY_CAST(casty AS BIGINT) IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
               CAST(SUM(TRY_CAST(casty AS BIGINT)) AS BIGINT) AS cast_ok_sum
        FROM x
    """,
    doc="Spark 4 ANSI-mode TRY_* surface under the driver hash: since "
    "4.0 ANSI SQL is the DEFAULT (spark.sql.ansi.enabled=true), so "
    "division by zero, BIGINT overflow, and bad casts RAISE unless "
    "routed through the TRY variants — the exact error-tolerance "
    "contract a 100 TB batch job needs (one malformed row must not "
    "kill a 6-hour run; the TRY result is NULL, countable and "
    "quarantinable). Certified against constructed per-row hazards: "
    "try_divide with a modular zero denominator, try_add pushed over "
    "BIGINT max on exactly the rows where l_orderkey % 2000 > 1000 "
    "(the oracle computes the same guard arithmetically — DuckDB has "
    "no try_add and would error on the overflow), and TRY_CAST of a "
    "column that alternates numeric strings and flag letters (DuckDB "
    "TRY_CAST matches directly). Division results are floor-quantized "
    "BIGINT (rule 25) and the overflow-survivor sum is taken mod "
    "1000003 to stay in range. Narrow per-row map + one hash agg — "
    "codegen'd, no shuffle before the single fold.",
)
def fn_ansi_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    x = l.select(
        "l_orderkey",
        (F.col("l_linenumber") % 3).cast("long").alias("den"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.expr(
            "try_add(CAST(9223372036854775807 - 1000 AS BIGINT),"
            " CAST(l_orderkey % 2000 AS BIGINT))"
        ).alias("add_res"),
        F.expr(
            "CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_orderkey AS STRING)"
            " ELSE l_returnflag END"
        ).alias("casty"),
    )
    return x.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.when(F.expr("try_divide(cents, den)").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_div_null"),
        F.sum(F.expr("CASE WHEN den > 0 THEN cents DIV den END"))
        .cast("long")
        .alias("sum_div_floor"),
        F.sum(F.when(F.col("add_res").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_add_overflow"),
        F.sum(F.col("add_res") % 1000003)
        .cast("long")
        .alias("add_ok_mod_sum"),
        F.sum(
            F.when(F.expr("try_cast(casty AS BIGINT)").isNull(), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_cast_null"),
        F.sum(F.expr("try_cast(casty AS BIGINT)"))
        .cast("long")
        .alias("cast_ok_sum"),
    )
