"""plans/rank.py — the distributed exact-rank/NTILE machinery must be
bit-identical to the single-partition window spellings it replaces
(VERDICT r6 task: scale-safe plans for the exact-rank family), across
ascending/descending orders, skewed and low-cardinality distributions,
ties broken by a unique key, and the n < k NTILE edge case.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.plans.rank import (
    exact_ntile,
    with_global_rank,
    with_grouped_rank,
)


def _fixture(spark, seed: int, n: int = 5000):
    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.randint(0, 4),  # low-cardinality group (the ntile trap)
            rng.choice([0, 0, 0, 1, 7, 10**6]),  # heavily tied + skewed
            rng.randint(0, 10**9),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, grp long, skewed long, v long")


@pytest.mark.parametrize("seed", [1, 2])
def test_global_rank_matches_window(spark, seed):
    df = _fixture(spark, seed)
    exp = df.select(
        "id", F.row_number().over(W.orderBy("skewed", "id")).cast("long").alias("rn")
    )
    got = with_global_rank(df, ["skewed", "id"], "rn").select("id", "rn")
    assert exp.join(got.withColumnRenamed("rn", "rn2"), "id").where("rn != rn2").count() == 0


def test_global_rank_desc_and_total(spark):
    df = _fixture(spark, 3)
    order = [F.col("v").desc(), F.col("id")]
    exp = df.select("id", F.row_number().over(W.orderBy(*order)).cast("long").alias("rn"))
    got = with_global_rank(df, order, "rn", total_col="n")
    assert got.select("n").distinct().collect()[0][0] == df.count()
    assert exp.join(got.select("id", F.col("rn").alias("rn2")), "id").where("rn != rn2").count() == 0


@pytest.mark.parametrize("k", [3, 10, 64])
def test_exact_ntile_matches_window(spark, k):
    df = _fixture(spark, 4)
    order = [F.col("skewed").desc(), F.col("id")]
    exp = df.select("id", F.ntile(k).over(W.orderBy(*order)).cast("long").alias("b"))
    ranked = with_global_rank(df, order, "rn", total_col="n")
    got = ranked.select("id", exact_ntile(F.col("rn"), F.col("n"), k).alias("b2"))
    assert exp.join(got, "id").where("b != b2").count() == 0


def test_exact_ntile_small_n(spark):
    """n < k: every row is its own bucket (bucket == rank)."""
    df = spark.createDataFrame([(i, i * 7 % 5) for i in range(4)], "id long, v long")
    exp = df.select("id", F.ntile(10).over(W.orderBy("v", "id")).cast("long").alias("b"))
    ranked = with_global_rank(df, ["v", "id"], "rn", total_col="n")
    got = ranked.select("id", exact_ntile(F.col("rn"), F.col("n"), 10).alias("b2"))
    assert exp.join(got, "id").where("b != b2").count() == 0


def test_grouped_rank_matches_partitioned_window(spark):
    df = _fixture(spark, 5)
    exp = df.select(
        "id",
        F.row_number().over(W.partitionBy("grp").orderBy("v", "id")).cast("long").alias("rn"),
    )
    got = with_grouped_rank(df, ["grp"], ["v", "id"], "rn", group_total_col="gn")
    assert exp.join(got.select("id", F.col("rn").alias("rn2")), "id").where("rn != rn2").count() == 0
    sizes = df.groupBy("grp").count()
    assert (
        got.select("grp", "gn").distinct().join(sizes, "grp").where("gn != count").count() == 0
    )


def test_rank_plan_has_no_data_scale_single_partition(spark, sf_dir):
    """The whole point: the executed plan's only SinglePartition
    exchanges feed bounded summary tables (per-partition counts), and
    the data-scale row_number window is partitioned by the range
    bucket — assert the rank window's spec includes the pid column."""
    from solarflare_etl_pipeline_spark.catalog import table

    c = table(spark, sf_dir, "customer")
    ranked = with_global_rank(c, [F.col("c_acctbal").desc(), F.col("c_custkey")], "rn")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "row_number()" in plan
    # every row_number window must be partitioned (windowspecdefinition
    # carrying the internal pid partition column)
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__rank_pid" in line, line


@pytest.mark.parametrize("seed", [3, 4])
def test_grouped_prefix_sum_matches_window(spark, seed):
    """with_grouped_prefix_sum must be bit-identical to the
    low-cardinality-partition cumulative window it replaces, under
    skewed groups, tied order keys broken by the unique id, and both
    ascending and descending orders."""
    from solarflare_etl_pipeline_spark.plans.rank import (
        with_grouped_prefix_sum,
    )

    df = _fixture(spark, seed)
    for order, cols in [
        ([F.col("v"), F.col("id")], ["v", "id"]),
        ([F.col("v").desc(), F.col("id")], None),
    ]:
        if cols:
            w = W.partitionBy("grp").orderBy(*cols).rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        else:
            w = W.partitionBy("grp").orderBy(
                F.col("v").desc(), F.col("id")
            ).rowsBetween(W.unboundedPreceding, W.currentRow)
        exp = df.select(
            "id", F.sum("skewed").over(w).cast("long").alias("cum")
        )
        got = with_grouped_prefix_sum(
            df, ["grp"], order, "skewed", sum_col="cum"
        ).select("id", "cum")
        assert (
            exp.join(got.withColumnRenamed("cum", "cum2"), "id")
            .where("cum != cum2")
            .count()
            == 0
        )


def test_grouped_prefix_sum_single_group(spark):
    """Degenerate one-group case — the global running total."""
    from solarflare_etl_pipeline_spark.plans.rank import (
        with_grouped_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, 1, i % 7) for i in range(1000)], "id long, one long, v long"
    )
    w = W.partitionBy("one").orderBy("id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    exp = df.select("id", F.sum("v").over(w).cast("long").alias("cum"))
    got = with_grouped_prefix_sum(df, ["one"], ["id"], "v").select(
        "id", F.col("cum")
    )
    assert (
        exp.join(got.withColumnRenamed("cum", "cum2"), "id")
        .where("cum != cum2")
        .count()
        == 0
    )


def test_ccnet_buckets_plan_has_no_corpus_scale_lang_window(spark, sf_dir):
    """VERDICT r7 What's-wrong #1: a 6-decimal per-doc NLL grid grows
    with the corpus, so the tercile running count must NOT be a
    cumulative window partitioned only by the ~|langs| column. Pin the
    executed plan: every running-sum window either carries the
    internal range-bucket pid column (the with_grouped_prefix_sum
    shape) or runs over the bounded |langs|x|parts| offset table."""
    from solarflare_etl_pipeline_spark.registry import load_all

    spec = load_all()["llm_ccnet_buckets"]
    plan = (
        spec.spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    data_scale = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition(lang" in line and "__rank_pid" not in line
    ]
    # the only lang-partitioned window allowed is the offset-table one,
    # which orders by the pid column (bounded rows per group) and so
    # never lands in data_scale; anything else is the r7 defect back.
    assert data_scale == [], data_scale
    assert "windowspecdefinition(lang" in plan  # the offset window exists


def test_global_running_sum_plan_is_distributed(spark, sf_dir):
    """win_global_running_sum must never carry an unpartitioned
    running-sum window: every windowspecdefinition in the executed
    plan includes the internal range-bucket pid column (data-scale
    stage) or orders by it (bounded offset table)."""
    from solarflare_etl_pipeline_spark.registry import load_all

    spec = load_all()["win_global_running_sum"]
    plan = (
        spec.spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    bad = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition(" in line and "__rank_pid" not in line
    ]
    assert bad == [], bad
