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

#: Session-lifetime cache of each registry query's rendered physical
#: plan at SF_DIR (r14, VERDICT r13 #3): populated by test_oracle_parity
#: as a by-product of the build it already does, consumed by
#: test_plan_audit's three registry-wide gates so they audit a string
#: instead of rebuilding the DataFrame (and re-running its eager
#: checkpoints/training collects) once per gate.
PLAN_STRINGS: dict[str, str] = {}


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


def _tag_pandas_cell(v):
    """Type-tag a pandas cell the way the driver's canonicalization
    distinguishes values. The load-bearing asymmetries vs `_norm_cell`:

    * DuckDB HUGEINT (``SUM(int)``) reaches pandas as float64 → tagged
      ('float', 64.0) and mismatches Spark's int64 ('int', 64) — the
      r4+r5 ``llm_pack_sequences_global`` red (ORACLE_PARITY.md rule 19),
      which the fetchall leg cannot see (HUGEINT → Python int there).
    * Spark DateType reaches pandas as object-dtype ``datetime.date``
      while DuckDB DATE arrives datetime64 → ('date', …) vs ('ts', …)
      mismatch — the ``merge_scd2`` trap.
    * list/ndarray/dict cells raise, mirroring the driver's
      ``unhashable type: 'list'`` err on ARRAY result columns (rule 18).
    """
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise TypeError(
            f"driver-unhashable result cell of type {type(v).__name__}: "
            "ARRAY/MAP results cannot pass the driver's pandas canonicalization "
            "(ORACLE_PARITY.md rule 18) — emit scalar columns"
        )
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("float", "NaN")
        return ("float", round(f, 9))
    if isinstance(v, decimal.Decimal):
        return ("decimal", v)
    if isinstance(v, pd.Timestamp):
        return ("ts", v.to_pydatetime().isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    return v


def _canon_pandas(pdf):
    """Driver-faithful canonicalization of a pandas frame: project columns
    in sorted-name order, then type-tag every cell and sort rows by the
    tagged representation (sorting tagged cells rather than raw columns
    keeps mixed None/value object columns orderable while still raising
    on list-valued cells, as the driver does)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_tag_pandas_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return cols, rows


def assert_pandas_parity(spark_df, con, sql):
    """The driver-faithful leg: Spark ``.toPandas()`` vs DuckDB ``.df()``,
    compared with dtype-sensitive cell tags. Catches HUGEINT→float64,
    object-date vs datetime64, and array-column traps that the fetchall
    leg structurally cannot observe (both reds of CORRECTNESS_r05)."""
    s_pdf = spark_df.toPandas()
    o_pdf = con.sql(sql).df()

    assert len(s_pdf) == len(o_pdf), f"row count: spark={len(s_pdf)} oracle={len(o_pdf)}"
    assert sorted(s_pdf.columns) == sorted(
        o_pdf.columns
    ), f"columns: spark={sorted(s_pdf.columns)} oracle={sorted(o_pdf.columns)}"
    s_cols, s_rows = _canon_pandas(s_pdf)
    o_cols, o_rows = _canon_pandas(o_pdf)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mismatches, (
        "pandas-path value mismatches (spark vs oracle) — these WOULD go red "
        f"under the driver even if fetchall parity passes: {mismatches[:3]}"
    )


def assert_parity(spark_df, con, sql, *, check_values=True):
    """Mirror of the driver's compare: count, sorted column names, and
    order-insensitive normalized values — two legs. Leg 1 (fetchall)
    compares Python-native values; leg 2 (pandas) mirrors the driver's
    actual canonicalization path and is the one that catches dtype traps
    (ORACLE_PARITY.md rules 18–19).

    r14 (VERDICT r13 #3 — suite wall-clock): BOTH engines used to
    execute twice per test. The Spark frame is persist()ed so the
    collect leg computes and caches and the toPandas leg re-reads the
    cached rows through the unchanged Arrow/pandas serialization path;
    the oracle SQL is materialized ONCE into a temp table and both
    DuckDB legs read it back (fetchall and .df() conversions — where
    the dtype traps live — are decided by the stored COLUMN TYPES,
    which CTAS preserves: HUGEINT still reaches pandas as float64,
    DATE as datetime64, exactly as before). The slowest parity tests
    were paying 30-40 s per redundant DuckDB execution at sf0.001."""
    spark_df = spark_df.persist()
    try:
        s_cols = spark_df.columns
        # Overlap the two ENGINES (r14): DuckDB materializes the oracle
        # on a worker thread (it releases the GIL while executing)
        # while Spark computes the collect leg on this one; the
        # connection is only touched by one thread at a time (the
        # worker owns it until fut.result() returns).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(
                con.execute,
                f"CREATE OR REPLACE TEMP TABLE _parity_oracle AS {sql}",
            )
            s_rows = [tuple(r) for r in spark_df.collect()]
            fut.result()
        sql = "SELECT * FROM _parity_oracle"
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
        assert_pandas_parity(spark_df, con, sql)
    finally:
        spark_df.unpersist()
