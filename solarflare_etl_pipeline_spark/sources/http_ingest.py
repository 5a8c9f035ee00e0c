"""Live HTTP JSON → DataFrame ingestion with retries and a literal fallback.

Completes reference fidelity for R1 + R9 (SURVEY.md §2.1): the
reference fetches the DONKI FLR API with an ``HttpOperator``
(``/root/reference/dags/etl.py:36-45``) and its starter DAG falls back
to a hard-coded literal relation when the API is unreachable
(``/root/reference/dags/exampledag.py:49-70``). Here the fetch is
driver-side control flow (stdlib ``urllib`` — the payload is KBs of
JSON, not data-plane work), and everything after it is the same lazy
Spark plan as the staged-file path (``json_ingest.transform_flares``).

Scale note: an HTTP API batch is tiny by definition (the reference's
window is ~10²-10³ records); the driver-side fetch + ``createDataFrame``
is the right shape. Bulk object-store JSON goes through
``spark.read.json`` instead (``json_ingest.read_flare_json``).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from solarflare_etl_pipeline_spark.registry import register
from solarflare_etl_pipeline_spark.sources.json_ingest import (
    FLARE_RAW_SCHEMA,
    transform_flares,
)

#: Deterministic fallback relation (reference R9: the starter DAG's
#: hard-coded record list used when the API call cannot be made,
#: dags/exampledag.py:49-70). DONKI-shaped; one record carries a null
#: activeRegionNum to keep the null-tolerant path exercised.
FALLBACK_FLARES: tuple[dict, ...] = (
    {
        "flrID": "FLR-FALLBACK-001",
        "classType": "M1.2",
        "beginTime": "2024-01-01T00:30Z",
        "peakTime": "2024-01-01T01:10Z",
        "endTime": "2024-01-01T01:45Z",
        "sourceLocation": "N05E34",
        "activeRegionNum": 13536,
        "link": "https://example.invalid/FLR-FALLBACK-001",
    },
    {
        "flrID": "FLR-FALLBACK-002",
        "classType": "C7.8",
        "beginTime": "2024-01-02T11:00Z",
        "peakTime": "2024-01-02T11:20Z",
        "endTime": "2024-01-02T11:55Z",
        "sourceLocation": "S12W40",
        "activeRegionNum": None,
        "link": "https://example.invalid/FLR-FALLBACK-002",
    },
    {
        "flrID": "FLR-FALLBACK-003",
        "classType": "X1.0",
        "beginTime": "2024-01-03T22:05Z",
        "peakTime": "2024-01-03T22:40Z",
        "endTime": "2024-01-04T00:10Z",
        "sourceLocation": "N18W77",
        "activeRegionNum": 13541,
        "link": "https://example.invalid/FLR-FALLBACK-003",
    },
)


def fetch_json(url: str, *, retries: int = 3, timeout: float = 5.0, backoff: float = 0.5):
    """GET ``url`` and parse the JSON body, retrying transient failures.

    Mirrors the reference HttpOperator's fetch + ``response.json()``
    (dags/etl.py:36-45). Raises the last error after ``retries``
    attempts — callers decide whether to fall back.
    """
    last_err: Exception | None = None
    for attempt in range(max(1, retries)):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except (urllib.error.URLError, OSError, ValueError) as err:
            last_err = err
            if attempt + 1 < max(1, retries) and backoff > 0:
                time.sleep(backoff * (attempt + 1))
    if last_err is None:  # unreachable: >=1 attempt always records err
        raise RuntimeError("fetch_json: no attempt recorded an error")
    raise last_err


def _normalize_records(records) -> list[tuple]:
    """Null-tolerant field access, exactly the reference's ``dict.get``
    (dags/etl.py:54-61): a missing key becomes NULL, never an error."""
    fields = [f.name for f in FLARE_RAW_SCHEMA.fields]
    return [tuple(rec.get(name) for name in fields) for rec in records]


def ingest_http(
    spark: SparkSession,
    url: str,
    *,
    retries: int = 3,
    timeout: float = 5.0,
    backoff: float = 0.5,
    fallback=FALLBACK_FLARES,
) -> DataFrame:
    """Fetch a DONKI-shaped JSON array over HTTP and produce the typed,
    projected flare DataFrame; on fetch failure, use the literal
    fallback relation (R9). The Spark plan downstream of the payload is
    identical either way."""
    try:
        records = fetch_json(url, retries=retries, timeout=timeout, backoff=backoff)
        # Shape-validate INSIDE the guard: a live endpoint returning
        # well-formed JSON of the wrong shape (an error object instead of
        # a list of dicts) must take the fallback path too, not blow up
        # in _normalize_records with an AttributeError.
        if not isinstance(records, list) or not all(isinstance(r, dict) for r in records):
            raise ValueError("payload is not a JSON array of objects")
        rows = _normalize_records(records)
    except Exception:
        rows = _normalize_records(list(fallback))
    raw = spark.createDataFrame(rows, FLARE_RAW_SCHEMA)
    return transform_flares(raw)


@register(
    "ingest_http_fallback",
    oracle="""
        SELECT * FROM (VALUES
            ('FLR-FALLBACK-001', 'M1.2', TIMESTAMP '2024-01-01 00:30:00',
             TIMESTAMP '2024-01-01 01:10:00', TIMESTAMP '2024-01-01 01:45:00',
             'N05E34', 13536, 'https://example.invalid/FLR-FALLBACK-001'),
            ('FLR-FALLBACK-002', 'C7.8', TIMESTAMP '2024-01-02 11:00:00',
             TIMESTAMP '2024-01-02 11:20:00', TIMESTAMP '2024-01-02 11:55:00',
             'S12W40', CAST(NULL AS INT), 'https://example.invalid/FLR-FALLBACK-002'),
            ('FLR-FALLBACK-003', 'X1.0', TIMESTAMP '2024-01-03 22:05:00',
             TIMESTAMP '2024-01-03 22:40:00', TIMESTAMP '2024-01-04 00:10:00',
             'N18W77', 13541, 'https://example.invalid/FLR-FALLBACK-003')
        ) AS t(flr_id, class_type, begin_time, peak_time, end_time,
               source_location, active_region_num, link)
    """,
    doc="HTTP ingest with fallback literal relation (reference R1+R9): the fetch "
    "targets an unreachable loopback port (instant refusal — no network dependence "
    "in the driver harness), exercising the retry-then-fallback path; the live-fetch "
    "path is unit-tested against a local fixture HTTP server.",
)
def ingest_http_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Port 9 (discard) on loopback refuses instantly in this sandbox —
    # deterministic fallback without waiting on timeouts.
    return ingest_http(
        spark, "http://127.0.0.1:9/donki/flr", retries=2, timeout=0.5, backoff=0.0
    )
