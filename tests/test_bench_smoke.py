"""Bench smoke: every headline query in bench.py's BENCH_QUERIES must
resolve to a registered spec (and the drift canary must stay a subset).

Round-4 postmortem (VERDICT.md r4 §What's wrong #1): win_sessionize threw
AnalysisException on the regenerated fixtures and the ENTIRE 25-query bench
died with rc=1 — no number recorded for the round. Nothing in tests/ ran the
bench's query set, so the crash shipped silently.

r14: executability itself is certified by test_oracle_parity.py, which
collect()s EVERY registered query (a strict superset of the .count()
this file used to repeat per bench entry) — so the bench-breaks-CI
property is preserved while the suite stops running ~250 queries twice.
What oracle_parity cannot see is a bench NAME that no longer resolves;
that is what this file pins.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from solarflare_etl_pipeline_spark.registry import load_all


SPECS = load_all()


@pytest.mark.parametrize("name", bench.BENCH_QUERIES)
def test_bench_query_registered(name):
    """Every bench name must resolve to a registered spec. r14
    (VERDICT r13 #3 — suite wall-clock): the per-query ``.count()``
    this test used to run is a strict SUBSET of what
    tests/test_oracle_parity.py::test_query_parity already executes
    for every registered query (a full ``collect()`` in the same
    session at the same sf_dir), so executing here doubled ~250
    query runs for no added coverage. The round-4 regression class
    this file was built for — a bench query that cannot execute —
    still fails the suite, in oracle_parity; THIS test pins the other
    failure mode: a bench list entry that no longer resolves."""
    assert name in SPECS, f"bench.py names unregistered query {name!r}"


def test_bench_canary_subset():
    """The drift canary must stay a subset of the bench list (a canary
    entry missing from BENCH_QUERIES would silently shrink the
    cross-round normalizer)."""
    missing = [q for q in bench.CANARY_QUERIES if q not in bench.BENCH_QUERIES]
    assert not missing, f"canary queries not in bench list: {missing}"
