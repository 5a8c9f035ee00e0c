"""A/B the r13 graph rewrites in one clean session: old self-join edge
build vs copurchase_edges / copurchase_pair_counts, and the cc round
broadcast toggle. Run idle: python tools/exp_r13b.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    print(f"  {label}: best={min(runs):.2f}s runs={[round(r,2) for r in runs]}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_edges(li):
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )


def old_pair_counts(l):
    a, b = l.alias("a"), l.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
    )


def main():
    spark = get_spark("r13-exp-b")
    table(spark, SF, "events").count()
    from solarflare_etl_pipeline_spark.operators import analytics as A

    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    ld = li.distinct()

    print("J1. edge build again, 3 runs each")
    t("old self-join edges (noop)", lambda: noop(old_edges(li)))
    t("copurchase_edges (noop)", lambda: noop(A.copurchase_edges(li)))
    print("J2. pair counts")
    t("old pair counts (noop)", lambda: noop(old_pair_counts(ld)))
    t("copurchase_pair_counts (noop)", lambda: noop(A.copurchase_pair_counts(ld)))
    print("J3. edges2 (union swap) + ckpt")
    t("old edges -> union + ckpt", lambda: old_edges(li).unionAll(
        old_edges(li).select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint())
    def new_e2():
        e = A.copurchase_edges(li)
        return e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpoint()
    t("new edges -> union + ckpt", new_e2)
    print("J4. full graph_cc_portable: bcast on/off (current code)")
    os.environ["SOLARFLARE_GRAPH_BCAST"] = "1"
    t("cc_portable bcast=1 (count)", lambda: A.graph_cc_portable(spark, SF).count(), n=3)
    os.environ["SOLARFLARE_GRAPH_BCAST"] = "0"
    t("cc_portable bcast=0 (count)", lambda: A.graph_cc_portable(spark, SF).count(), n=3)
    os.environ["SOLARFLARE_GRAPH_BCAST"] = "1"
    print("J5. full graph_degree_gini / adamic_adar / modularity (new code)")
    t("degree_gini (count)", lambda: A.graph_degree_gini(spark, SF).count(), n=3)
    t("adamic_adar (count)", lambda: A.graph_adamic_adar(spark, SF).count(), n=3)
    t("modularity (count)", lambda: A.graph_modularity(spark, SF).count(), n=3)
    print("J6. triangle (new code)")
    t("triangle (count)", lambda: A.graph_triangle_count(spark, SF).count(), n=3)


if __name__ == "__main__":
    main()
