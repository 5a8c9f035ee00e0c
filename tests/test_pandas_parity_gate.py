"""Self-test of the driver-faithful pandas comparator leg
(`tests/conftest.assert_pandas_parity`).

The round-5 judge showed the local fetchall comparator is structurally
blind to two whole classes of driver reds:

* DuckDB HUGEINT (`SUM(int)`) → Python `int` via fetchall (parity
  passes) but float64 via `.df()` (driver hash red) — the r4+r5
  `llm_pack_sequences_global` red.
* ARRAY result columns → tuples via fetchall (hashable, parity passes)
  but lists via pandas (driver errs `unhashable type: 'list'`) — the r5
  `agg_percentiles` red.

These tests pin the new leg's sensitivity: it MUST fail on fixtures
reproducing each trap, and pass once the documented fix is applied
(ORACLE_PARITY.md rules 18-19).
"""

from __future__ import annotations

import pytest

from tests.conftest import assert_pandas_parity


def test_uncast_sum_int_fails(spark, oracle):
    # Spark: sum(long) -> LONG -> int64. DuckDB: SUM(int) -> HUGEINT ->
    # float64 via .df(). The leg must see ('int', 6) vs ('float', 6.0).
    df = spark.range(1, 4).selectExpr("sum(id) AS s")
    with pytest.raises(AssertionError, match="pandas-path value mismatches"):
        assert_pandas_parity(
            df, oracle, "SELECT SUM(x) AS s FROM (SELECT UNNEST([1,2,3]) AS x)"
        )


def test_cast_sum_int_passes(spark, oracle):
    df = spark.range(1, 4).selectExpr("sum(id) AS s")
    assert_pandas_parity(
        df,
        oracle,
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT UNNEST([1,2,3]) AS x)",
    )


def test_array_result_column_raises(spark, oracle):
    # Mirrors the driver's canonicalizer erring on list cells.
    df = spark.range(1).selectExpr("array(1, 2) AS a")
    with pytest.raises(TypeError, match="driver-unhashable"):
        assert_pandas_parity(df, oracle, "SELECT [1, 2] AS a")


def test_date_vs_timestamp_skew_fails(spark, oracle):
    # Spark DateType -> object datetime.date; DuckDB DATE -> datetime64.
    # The driver sees these as different values (the merge_scd2 trap).
    df = spark.sql("SELECT DATE'2021-01-02' AS d")
    with pytest.raises(AssertionError, match="pandas-path value mismatches"):
        assert_pandas_parity(df, oracle, "SELECT DATE '2021-01-02' AS d")


def test_timestamp_both_sides_passes(spark, oracle):
    # The documented normalization: cast DATE to TIMESTAMP on both sides.
    df = spark.sql("SELECT TIMESTAMP'2021-01-02 00:00:00' AS t")
    assert_pandas_parity(df, oracle, "SELECT TIMESTAMP '2021-01-02 00:00:00' AS t")


def test_null_timestamp_passes(spark, oracle):
    # NaT (pandas) vs None (Spark collect) must both canonicalize to null.
    df = spark.sql("SELECT CAST(NULL AS TIMESTAMP) AS t, 1 AS k")
    assert_pandas_parity(df, oracle, "SELECT CAST(NULL AS TIMESTAMP) AS t, 1 AS k")
