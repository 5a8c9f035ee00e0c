"""Round-14 A/B (VERDICT r13 #6): wedge-join vs adjacency-array form for
graph_jaccard_candidates / graph_adamic_adar common-neighbor counting.

Current plan: candidates ⋈ adjacency(x) on pa, then ⋈ adjacency(y) on
(pb, w) — the second join shuffles BOTH the |cand| x avg-degree wedge
stream and the full 2x|E| adjacency. Candidate plan: ONE groupBy(u)
collect_set builds per-node sorted neighbor arrays; candidates join the
(node -> array) table twice (broadcastable — node-keyed, dimension-
sized), then n_common = size(array_intersect(na, nb)) per pair, no
wedge shuffle at all. For adamic-adar the common neighbors are exploded
(bounded: sum of per-candidate intersections) and the degree lookup
stays a broadcast join.

Equality: und rows are distinct (pairs_all is a groupBy output), so
collect_set(v) per u is exactly the neighbor set and its size the
degree; array_intersect on distinct-element arrays returns the common
set. Checked collect-equal below before timing.

Measurement-only tooling; the winner gets ported into the ops.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.operators.analytics import BASKET_MIN_SUP
from solarflare_etl_pipeline_spark.session import get_spark


def _pairs_all(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
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
        .localCheckpoint()
    )


def jaccard_wedge(pairs_all):
    pairs = pairs_all.where(F.col("n_ab") >= BASKET_MIN_SUP).select("pa", "pb")
    und = pairs_all.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        pairs_all.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    x = und.select(F.col("u").alias("pa"), F.col("v").alias("w"))
    y = und.select(F.col("u").alias("pb"), F.col("v").alias("w"))
    common = (
        pairs.join(x, "pa").join(y, ["pb", "w"]).groupBy("pa", "pb").agg(
            F.count("*").alias("n_common")
        )
    )
    da = deg.select(F.col("u").alias("pa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("u").alias("pb"), F.col("d").alias("deg_b"))
    return (
        pairs.join(F.broadcast(da), "pa")
        .join(F.broadcast(db), "pb")
        .join(common, ["pa", "pb"], "left")
        .select(
            "pa",
            "pb",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            "deg_a",
            "deg_b",
            F.expr(
                "CAST(COALESCE(n_common, 0) * 1000000"
                " DIV (deg_a + deg_b - COALESCE(n_common, 0)) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def jaccard_array(pairs_all):
    pairs = pairs_all.where(F.col("n_ab") >= BASKET_MIN_SUP).select("pa", "pb")
    und = pairs_all.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        pairs_all.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    adj = und.groupBy("u").agg(F.sort_array(F.collect_set("v")).alias("nbr"))
    aa = adj.select(F.col("u").alias("pa"), F.col("nbr").alias("na"))
    ab = adj.select(F.col("u").alias("pb"), F.col("nbr").alias("nb"))
    return (
        pairs.join(F.broadcast(aa), "pa")
        .join(F.broadcast(ab), "pb")
        .select(
            "pa",
            "pb",
            F.size(F.array_intersect("na", "nb")).cast("long").alias("n_common"),
            F.size("na").alias("deg_a"),
            F.size("nb").alias("deg_b"),
        )
        .select(
            "pa",
            "pb",
            "n_common",
            "deg_a",
            "deg_b",
            F.expr(
                "CAST(n_common * 1000000"
                " DIV (deg_a + deg_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def aa_wedge(pairs_all):
    pairs = pairs_all.where(F.col("n_ab") >= BASKET_MIN_SUP).select("pa", "pb")
    und = pairs_all.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        pairs_all.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    x = und.select(F.col("u").alias("pa"), F.col("v").alias("w"))
    y = und.select(F.col("u").alias("pb"), F.col("v").alias("w"))
    wedges = pairs.join(x, "pa").join(y, ["pb", "w"])
    terms = (
        wedges.join(F.broadcast(deg.select(F.col("u").alias("w"), "d")), "w")
        .where(F.col("d") >= 2)
        .select(
            "pa",
            "pb",
            F.round(F.lit(1.0) / F.log(F.col("d").cast("double")), 9)
            .cast("decimal(28,12)")
            .alias("t"),
        )
    )
    agg = terms.groupBy("pa", "pb").agg(F.count("*").alias("n"), F.sum("t").alias("s"))
    return pairs.join(agg, ["pa", "pb"], "left").select(
        "pa",
        "pb",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_common_deg2"),
        F.coalesce(F.col("s").cast("double"), F.lit(0.0)).alias("adamic_adar"),
    )


def aa_array(pairs_all):
    pairs = pairs_all.where(F.col("n_ab") >= BASKET_MIN_SUP).select("pa", "pb")
    und = pairs_all.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        pairs_all.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    adj = und.groupBy("u").agg(F.sort_array(F.collect_set("v")).alias("nbr"))
    deg = adj.select(F.col("u").alias("w"), F.size("nbr").cast("long").alias("d"))
    aa_ = adj.select(F.col("u").alias("pa"), F.col("nbr").alias("na"))
    ab_ = adj.select(F.col("u").alias("pb"), F.col("nbr").alias("nb"))
    terms = (
        pairs.join(F.broadcast(aa_), "pa")
        .join(F.broadcast(ab_), "pb")
        .select("pa", "pb", F.explode(F.array_intersect("na", "nb")).alias("w"))
        .join(F.broadcast(deg), "w")
        .where(F.col("d") >= 2)
        .select(
            "pa",
            "pb",
            F.round(F.lit(1.0) / F.log(F.col("d").cast("double")), 9)
            .cast("decimal(28,12)")
            .alias("t"),
        )
    )
    agg = terms.groupBy("pa", "pb").agg(F.count("*").alias("n"), F.sum("t").alias("s"))
    return pairs.join(agg, ["pa", "pb"], "left").select(
        "pa",
        "pb",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_common_deg2"),
        F.coalesce(F.col("s").cast("double"), F.lit(0.0)).alias("adamic_adar"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-graph-ab")
    table(spark, sf_dir, "events").count()  # warm

    variants = {
        "jaccard_wedge": jaccard_wedge,
        "jaccard_array": jaccard_array,
        "aa_wedge": aa_wedge,
        "aa_array": aa_array,
    }
    # equality first (fresh pairs_all per form to be fair on lineage)
    pa = _pairs_all(spark, sf_dir)
    for base in ("jaccard", "aa"):
        r1 = sorted(tuple(r) for r in variants[f"{base}_wedge"](pa).collect())
        r2 = sorted(tuple(r) for r in variants[f"{base}_array"](pa).collect())
        assert r1 == r2, f"{base}: forms disagree ({len(r1)} vs {len(r2)} rows)"
        print(f"[ab] {base}: equality OK over {len(r1)} rows", flush=True)

    for run in range(3):
        for tag, fn in variants.items():
            t0 = time.perf_counter()
            p = _pairs_all(spark, sf_dir)  # charge the checkpoint to each run
            spark.sparkContext.setJobDescription(f"graph-ab:{tag}:{run}")
            fn(p).write.format("noop").mode("overwrite").save()
            print(
                f"[ab] {tag} run{run}: {time.perf_counter() - t0:.2f}s",
                flush=True,
            )
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
