"""Plan-inspection helpers: the feedback loop for scale tuning.

``.explain("formatted")`` is how every operator gets audited after
correctness is green (build mandate): filters must appear in
``PushedFilters``, projections in ``ReadSchema``, dim joins as
``BroadcastHashJoin``, and Python must not appear in the hot path.
``tests/test_semantics.py`` asserts the load-bearing cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan as a string (post-AQE re-planning may
    differ at runtime; this is the initial physical plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_report(df: DataFrame) -> dict[str, bool | int]:
    """Quick audit flags for a plan: what a scale review looks for."""
    plan = physical_plan(df)
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "shuffles": plan.count("Exchange"),
        "has_pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "python_stages": sum(
            plan.count(marker)
            for marker in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "ArrowAggregatePython",
                "AggregateInPandas",
                "MapInArrow",
                "FlatMapGroupsInArrow",
            )
        ),
        # NOTE: under AQE the pre-execution plan (isFinalPlan=false) hides
        # WholeStageCodegen spans — False here is inconclusive, True is real
        "wholestage_codegen": "WholeStageCodegen" in plan,
    }


def assert_no_cartesian(df: DataFrame) -> None:
    """Guard: deliberate cross joins are the only acceptable ones."""
    report = plan_report(df)
    assert report["nested_loop_joins"] == 0, physical_plan(df)[:2000]
