"""Structural invariants for the round-10 late-session iterative
ledgers — properties the oracle-parity hash pins only implicitly.
Each is a law the ALGORITHM guarantees regardless of data, so a
violation means the ledger construction (not the fixture) broke:

* Bradley-Terry: wins never exceed games; ratings are non-negative;
  a rating is zero iff the item never won; the win-share ppm is a
  true rule-13 quotient.
* GESD: the three removed days are distinct and R statistics are
  positive (a removed point is by construction off-mean whenever the
  variance guard admitted the round).
* IPF raking: after the column pass every column total is within one
  integer unit-per-cell of the uniform target (truncation-only gap),
  and weights are non-negative.
* Funnel: stage counts are monotone non-increasing per source.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarflare_etl_pipeline_spark.registry import load_all

SPECS = load_all()


def test_bt_ratings_laws(spark, sf_dir):
    rows = SPECS["llm_bt_ratings_portable"].spark(spark, sf_dir).collect()
    assert rows, "fixture should produce at least one rated item"
    for r in rows:
        assert 0 <= r["wins"] <= r["games"]
        assert r["rating_ppm_r1"] >= 0 and r["rating_ppm_r2"] >= 0
        assert (r["rating_ppm_r1"] == 0) == (r["wins"] == 0)
        assert r["win_share_ppm"] == r["wins"] * 1_000_000 // r["games"]


def test_gesd_rounds_distinct_and_positive(spark, sf_dir):
    rows = SPECS["dq_outliers_gesd"].spark(spark, sf_dir).collect()
    days = [r["removed_day"] for r in rows]
    assert len(days) == len(set(days)), "a day was removed twice"
    assert all(r["r_stat"] > 0 for r in rows)
    assert [r["round"] for r in rows] == sorted(r["round"] for r in rows)


def test_ipf_column_targets(spark, sf_dir):
    df = SPECS["agg_raking_ipf"].spark(spark, sf_dir)
    rows = df.collect()
    assert rows
    assert all(r["weight_u"] >= 0 for r in rows)
    # after the column pass each column total sits at the uniform
    # nn/2 target, short only by the per-cell integer truncation
    from collections import defaultdict

    col_tot = defaultdict(int)
    for r in rows:
        col_tot[r["c"]] += r["weight_u"]
    totals = list(col_tot.values())
    n_cells_per_col = sum(1 for r in rows) / max(len(totals), 1)
    target = sum(r["weight_u"] for r in rows) / max(len(totals), 1)
    for t in totals:
        assert abs(t - target) <= n_cells_per_col + len(totals), (
            totals,
            target,
        )


def test_funnel_monotone(spark, sf_dir):
    rows = SPECS["llm_filter_funnel"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r["n_raw"]
            >= r["pass_length"]
            >= r["pass_repetition"]
            >= r["pass_dedup"]
            >= 0
        )


def test_bernoulli_cusum_alarm_consistency(spark, sf_dir):
    rows = SPECS["ts_cusum_bernoulli"].spark(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["max_s_ppm"] >= 0
    # alarms exist iff the max ever reached the threshold
    if r["n_alarm_days"] > 0:
        assert r["first_alarm_day"] is not None
    else:
        assert r["first_alarm_day"] is None
