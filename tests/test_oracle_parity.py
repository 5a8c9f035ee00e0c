"""Differential test: every registered query with oracle SQL must match
the DuckDB oracle (the driver's correctness gate, run locally).

Queries without oracle SQL get a rows-run smoke check (non-negative row
count, stable schema) — the driver applies the same weaker check.
"""

from __future__ import annotations

import pytest

from solarflare_etl_pipeline_spark.registry import load_all

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_parity(name, spark, oracle, sf_dir):
    spec = SPECS[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0
    else:
        from tests.conftest import assert_parity

        assert_parity(df, oracle, spec.oracle)
