"""Physical-plan audit across the entire registry (the build mandate's
"explain('formatted') and iterate" step, enforced): no accidental
cartesian products, no Python in plans that shouldn't have it, broadcast
where dimensions are joined."""

from __future__ import annotations

import pytest

from solarflare_etl_pipeline_spark.plans.explain import plan_report
from solarflare_etl_pipeline_spark.registry import load_all

SPECS = load_all()

#: Queries that intentionally cross-join (exact pairwise similarity —
#: the registered brute-force baselines; their scale path is the LSH op).
DELIBERATE_CROSS = {"llm_similarity_topk", "llm_dedup_embcos", "join_cross", "fn_string_sim"}

#: Queries whose plans legitimately run Python (Arrow-batched UDF/UDAF/
#: grouped-map — the sanctioned escape hatches).
PYTHON_OK = {"udf_scalar", "udaf_grouped", "udtf_grouped_state", "mm_decode_features"}

#: Queries that read a dimension table and must broadcast it.
MUST_BROADCAST = {"join_broadcast", "join_multiway"}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_accidental_cartesian(name, spark, sf_dir):
    report = plan_report(SPECS[name].spark(spark, sf_dir))
    if name in DELIBERATE_CROSS:
        return
    assert report["nested_loop_joins"] == 0, f"{name}: unexpected nested-loop join {report}"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_accidental_python(name, spark, sf_dir):
    report = plan_report(SPECS[name].spark(spark, sf_dir))
    if name in PYTHON_OK:
        assert report["python_stages"] > 0, f"{name}: expected an Arrow Python stage"
    else:
        assert report["python_stages"] == 0, f"{name}: Python leaked into the plan {report}"


@pytest.mark.parametrize("name", sorted(MUST_BROADCAST))
def test_dimension_joins_broadcast(name, spark, sf_dir):
    report = plan_report(SPECS[name].spark(spark, sf_dir))
    assert report["broadcast_joins"] >= 1, f"{name}: dimension join did not broadcast {report}"
