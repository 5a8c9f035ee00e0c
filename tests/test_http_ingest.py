"""HTTP ingestion adapter (reference R1 fetch + R9 literal fallback):
live-fetch path against a local fixture HTTP server, null-tolerant field
access, and the retry-then-fallback path against an unreachable port."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from solarflare_etl_pipeline_spark.sources.http_ingest import (
    FALLBACK_FLARES,
    fetch_json,
    ingest_http,
)

PAYLOAD = [
    {
        "flrID": "FLR-LIVE-001",
        "classType": "M5.5",
        "beginTime": "2024-02-01T08:00Z",
        "peakTime": "2024-02-01T08:30Z",
        "endTime": "2024-02-01T09:00Z",
        "sourceLocation": "N10E20",
        "activeRegionNum": 13600,
        "link": "https://example.invalid/FLR-LIVE-001",
    },
    # missing keys (endTime, activeRegionNum, link) — must become NULLs,
    # exactly the reference's dict.get tolerance (dags/etl.py:54-61)
    {
        "flrID": "FLR-LIVE-002",
        "classType": "C1.1",
        "beginTime": "2024-02-02T10:00Z",
        "peakTime": "2024-02-02T10:05Z",
        "sourceLocation": "S01W11",
    },
]


@pytest.fixture(scope="module")
def fixture_server():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(PAYLOAD).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/donki/flr"
    srv.shutdown()


def test_fetch_json_live(fixture_server):
    assert fetch_json(fixture_server, retries=1, timeout=5.0) == PAYLOAD


def test_fetch_json_unreachable_raises():
    with pytest.raises(Exception):
        fetch_json("http://127.0.0.1:9/nope", retries=2, timeout=0.5, backoff=0.0)


def test_ingest_http_live(spark, fixture_server):
    rows = {r.flr_id: r for r in ingest_http(spark, fixture_server, retries=1).collect()}
    assert set(rows) == {"FLR-LIVE-001", "FLR-LIVE-002"}
    full = rows["FLR-LIVE-001"]
    assert full.class_type == "M5.5"
    assert full.active_region_num == 13600
    assert full.begin_time.isoformat() == "2024-02-01T08:00:00"
    sparse = rows["FLR-LIVE-002"]
    assert sparse.end_time is None
    assert sparse.active_region_num is None
    assert sparse.link is None


def test_ingest_http_falls_back(spark):
    rows = ingest_http(
        spark, "http://127.0.0.1:9/nope", retries=2, timeout=0.5, backoff=0.0
    ).collect()
    assert {r.flr_id for r in rows} == {rec["flrID"] for rec in FALLBACK_FLARES}
    # the null-ARN fallback record keeps the nullable-int path covered
    assert any(r.active_region_num is None for r in rows)

@pytest.fixture()
def malformed_server():
    """Well-formed JSON, wrong shape: an error OBJECT, not a record array."""

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps({"error": "rate limited", "retryAfter": 60}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/donki/flr"
    srv.shutdown()


def test_ingest_http_malformed_payload_falls_back(spark, malformed_server):
    """A 200 response whose JSON is not a list of dicts must take the
    fallback relation, not raise inside record normalization."""
    rows = ingest_http(spark, malformed_server, retries=1).collect()
    assert {r.flr_id for r in rows} == {rec["flrID"] for rec in FALLBACK_FLARES}
