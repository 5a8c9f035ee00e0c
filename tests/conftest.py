"""Shared fixtures: one local SparkSession per test session, a DuckDB
oracle connection with the driver's views pre-registered, and the
Spark-vs-DuckDB comparator that mirrors the driver's correctness gate
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarflare_etl_pipeline_spark.catalog import TABLES
from solarflare_etl_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("solarflare-tests", cpus=min(8, os.cpu_count() or 4))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    # TYPE-SENSITIVE on purpose: the driver hashes typed values, so int 4
    # vs float 4.0 must mismatch here too (ORACLE_PARITY.md rule 14; the
    # round-2 fn_math FAIL was masked locally by Python's 4 == 4.0).
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # round to 9 significant-ish decimals: parity helpers make floats
        # bit-identical, this only absorbs repr noise
        return ("float", round(v, 9))
    if isinstance(v, decimal.Decimal):
        return ("decimal", v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def assert_parity(spark_df, con, sql, *, check_values=True):
    """Mirror of the driver's compare: count, sorted column names, and
    order-insensitive normalized values."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    o_cols = rel.columns
    o_rows = rel.fetchall()

    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    assert sorted(s_cols) == sorted(o_cols), f"columns: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if not check_values:
        return
    _, s_norm = _normalize(s_cols, s_rows)
    _, o_norm = _normalize(o_cols, o_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b
    ]
    assert not mismatches, f"first value mismatches (spark vs oracle): {mismatches[:3]}"
