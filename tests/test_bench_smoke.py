"""Bench smoke: every headline query in bench.py's BENCH_QUERIES must at
least execute end-to-end at sf0.001.

Round-4 postmortem (VERDICT.md r4 §What's wrong #1): win_sessionize threw
AnalysisException on the regenerated fixtures and the ENTIRE 25-query bench
died with rc=1 — no number recorded for the round. Nothing in tests/ ran the
bench's query set, so the crash shipped silently. This test closes that gap:
a headline query that cannot even .count() on the smallest fixture fails CI
here, before the driver's sf0.1 run can be taken down by it.

Correctness of each query is covered by test_oracle_parity.py; this test
only asserts executability of the exact set the bench measures.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from solarflare_etl_pipeline_spark.registry import load_all


@pytest.mark.parametrize("name", bench.BENCH_QUERIES)
def test_bench_query_executes(spark, sf_dir, name):
    specs = load_all()
    assert name in specs, f"bench.py names unregistered query {name!r}"
    n = specs[name].spark(spark, sf_dir).count()
    assert n >= 0
