"""Fixture-regime robustness: the driver has regenerated fixtures between
rounds with events.ts in two different parquet encodings —

  * TIMESTAMP(NANOS)  (rounds 1-3): Spark's vectorized reader rejects it;
    catalog.table() reads it as int64 ns via the nanosAsLong conf and
    truncates to microsecond timestamps, and
  * timestamp[us], no timezone (round 4+): reads natively as TIMESTAMP_NTZ.

Round 4's win_sessionize crash (cast TIMESTAMP_NTZ → DOUBLE is an
AnalysisException) shipped precisely because nothing exercised both
encodings. This test writes the SAME event rows in both encodings into a
tmpdir shaped like an sf_dir (other tables symlinked from the real
fixtures) and runs every ts-dependent batch query over each, asserting
(a) it executes and (b) both encodings produce identical results —
catalog.table()'s normalization is the invariant under test.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarflare_etl_pipeline_spark.catalog import TABLES, table
from solarflare_etl_pipeline_spark.registry import load_all

#: Batch queries whose semantics hinge on the events.ts column type.
TS_QUERIES = ("win_sessionize", "join_asof", "join_range", "flagship_daily_events")

ENCODINGS = ("us", "ns")


def _write_events(src_sf_dir: str, out_dir: str, unit: str) -> None:
    tbl = pq.read_table(os.path.join(src_sf_dir, "events.parquet"))
    ts = tbl.column("ts").cast(pa.timestamp(unit))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    # store_schema=False drops the arrow schema metadata so Spark sees only
    # the raw parquet logical type (exactly what the driver's writer emits);
    # coerce_timestamps=None keeps nanos as TIMESTAMP(NANOS).
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"), store_schema=False)


@pytest.fixture(scope="module", params=ENCODINGS)
def regime_sf_dir(request, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"regime_{request.param}")
    for t in TABLES:
        if t == "events":
            continue
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), out / f"{t}.parquet")
    _write_events(sf_dir, str(out), request.param)
    return str(out)


def test_written_encoding_is_distinct(regime_sf_dir):
    schema = pq.ParquetFile(os.path.join(regime_sf_dir, "events.parquet")).schema_arrow
    unit = "ns" if "regime_ns" in regime_sf_dir else "us"
    assert schema.field("ts").type == pa.timestamp(unit)


def test_catalog_normalizes_ts_to_timestamp(spark, regime_sf_dir):
    dt = dict(table(spark, regime_sf_dir, "events").dtypes)["ts"]
    assert dt in ("timestamp", "timestamp_ntz"), dt


@pytest.mark.parametrize("name", TS_QUERIES)
def test_ts_query_runs_on_both_regimes(spark, regime_sf_dir, name):
    spec = load_all()[name]
    assert spec.spark(spark, regime_sf_dir).count() >= 0


def test_regimes_agree(spark, sf_dir, tmp_path_factory):
    """Both encodings of the same rows must yield identical query results."""
    dirs = {}
    for unit in ENCODINGS:
        out = tmp_path_factory.mktemp(f"agree_{unit}")
        for t in TABLES:
            if t == "events":
                continue
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), out / f"{t}.parquet")
        _write_events(sf_dir, str(out), unit)
        dirs[unit] = str(out)
    specs = load_all()
    for name in TS_QUERIES:
        rows = {
            unit: sorted(map(str, specs[name].spark(spark, d).collect()))
            for unit, d in dirs.items()
        }
        assert rows["us"] == rows["ns"], f"{name} diverges between ts encodings"
