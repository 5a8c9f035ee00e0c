"""Round-13 micro-experiments (measurement only, guide §1).

Each experiment decomposes one expensive operator into its stages and/or
times a rewrite variant side by side. Run on an IDLE box:

  python tools/exp_r13.py A B C D
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, n=2):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    print(f"  {label}: best={min(runs):.2f}s runs={[round(r,2) for r in runs]}", flush=True)
    return min(runs)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def edges_df(spark):
    li = table(spark, SF, "lineitem")
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


def exp_A(spark):
    print("A. graph_cc_portable decomposition")
    edges = edges_df(spark)
    t("edges distinct (noop)", lambda: noop(edges))

    def build_e2_current():
        return edges.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpoint()

    def build_e2_explode():
        return edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst").localCheckpoint()

    t("edges2 union + ckpt (current)", lambda: build_e2_current())
    t("edges2 explode + ckpt (variant)", lambda: build_e2_explode())
    edges2 = build_e2_explode()

    def labels_init():
        return (
            edges2.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("lab"))
            .localCheckpoint()
        )

    t("labels init + ckpt", labels_init)
    labels = labels_init()

    def round_current(lbl):
        nbr = (
            edges2.join(
                lbl.select(F.col("node").alias("dst"), F.col("lab").alias("nlab")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlab").alias("mn"))
        )
        return (
            lbl.join(nbr.withColumnRenamed("src", "node"), "node", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce(F.col("mn"), F.col("lab"))).alias("lab"),
            )
            .localCheckpoint()
        )

    def round_bcast(lbl):
        nbr = (
            edges2.join(
                F.broadcast(
                    lbl.select(F.col("node").alias("dst"), F.col("lab").alias("nlab"))
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlab").alias("mn"))
        )
        return (
            lbl.join(F.broadcast(nbr.withColumnRenamed("src", "node")), "node", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce(F.col("mn"), F.col("lab"))).alias("lab"),
            )
            .localCheckpoint()
        )

    t("1 round current (shuffle join)", lambda: round_current(labels))
    t("1 round broadcast-labels", lambda: round_bcast(labels))

    def four_rounds(fn):
        lbl = labels
        for _ in range(4):
            lbl = fn(lbl)

    t("4 rounds current", lambda: four_rounds(round_current))
    t("4 rounds broadcast", lambda: four_rounds(round_bcast))


def exp_B(spark):
    print("B. llm_winnowing_overlap decomposition")
    from solarflare_etl_pipeline_spark.operators.similarity import (
        WINNOW_K,
        WINNOW_MAXDOC,
        WINNOW_W,
    )
    from pyspark.sql import Window

    d = table(spark, SF, "documents").where(
        F.length("text") >= WINNOW_K + WINNOW_W - 1
    )
    g = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - WINNOW_K + 1)).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.expr(f"substring(md5(substring(text, pos, {WINNOW_K})), 1, 15)").alias("h"),
    )
    t("g explode+md5 (noop)", lambda: noop(g))
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(WINNOW_W - 1), Window.currentRow
    )
    wm = g.select("doc_id", "pos", F.min("h").over(wmin).alias("fp")).where(
        F.col("pos") >= WINNOW_W
    )
    t("g+window (noop)", lambda: noop(wm))
    fps = wm.select("doc_id", "fp").distinct()
    t("fps distinct (noop)", lambda: noop(fps))
    t("fps ckpt", lambda: fps.localCheckpoint())
    fpc = fps.localCheckpoint()
    keep = fpc.groupBy("fp").agg(F.count("*").alias("c")).where(
        F.col("c") <= WINNOW_MAXDOC
    ).select("fp")
    f2 = fpc.join(keep, "fp")
    t("f2 ckpt", lambda: f2.localCheckpoint())


def exp_C(spark):
    print("C. llm_bpe_train_portable decomposition")
    d = table(spark, SF, "documents").select("text")
    census = (
        d.where(F.char_length("text") >= 2)
        .select(
            F.explode(F.sequence(F.lit(1), F.char_length("text") - 1)).alias("i"),
            "text",
        )
        .select(F.expr("substring(text, i, 2)").alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
    )
    t("census(d) (noop)", lambda: noop(census))
    alpha = (
        d.where(F.char_length("text") >= 1)
        .select(
            F.explode(F.sequence(F.lit(1), F.char_length("text"))).alias("i"),
            "text",
        )
        .select(F.expr("substring(text, i, 1)").alias("c"))
        .agg(F.countDistinct("c").cast("long").alias("n_sym"))
    )
    t("alpha (noop)", lambda: noop(alpha))
    from solarflare_etl_pipeline_spark.registry import load_all

    spec = load_all()["llm_bpe_train_portable"]
    t("full op (count)", lambda: spec.spark(spark, SF).count())


def exp_D(spark):
    print("D. graph_bipartite_projection variants")
    from pyspark.sql import Window as W
    from solarflare_etl_pipeline_spark.operators.analytics import (
        BIPROJ_CAP,
        BIPROJ_MIN_W,
        BIPROJ_TOPK,
    )

    l = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("v"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("u").orderBy("v"))
    capped = edges.withColumn("rn", rn).where(F.col("rn") <= BIPROJ_CAP)

    def current():
        a = capped.select("u", F.col("v").alias("part_a"))
        b = capped.select(F.col("u").alias("u2"), F.col("v").alias("part_b"))
        pairs = (
            a.join(b, (F.col("u") == F.col("u2")) & (F.col("part_a") < F.col("part_b")))
            .groupBy("part_a", "part_b")
            .agg(F.count("*").cast("long").alias("n_common_customers"))
            .where(F.col("n_common_customers") >= BIPROJ_MIN_W)
        )
        return pairs.orderBy(
            F.col("n_common_customers").desc(), "part_a", "part_b"
        ).limit(BIPROJ_TOPK)

    def hof():
        vs = capped.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("vs"))
        pairs = vs.select(
            F.explode(
                F.expr(
                    "flatten(transform(vs, (x, i) -> "
                    "transform(slice(vs, i + 2, size(vs)), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        ).select("p.part_a", "p.part_b")
        agg = (
            pairs.groupBy("part_a", "part_b")
            .agg(F.count("*").cast("long").alias("n_common_customers"))
            .where(F.col("n_common_customers") >= BIPROJ_MIN_W)
        )
        return agg.orderBy(
            F.col("n_common_customers").desc(), "part_a", "part_b"
        ).limit(BIPROJ_TOPK)

    t("current self-join (noop)", lambda: noop(current()))
    t("HOF pair explode (noop)", lambda: noop(hof()))
    a = sorted(map(tuple, current().collect()))
    b = sorted(map(tuple, hof().collect()))
    print(f"  equal={a == b} rows={len(a)}")


def exp_E(spark):
    print("E. llm_similarity_ivf_incremental decomposition")
    from pyspark.sql import Window
    from solarflare_etl_pipeline_spark.operators.similarity import (
        IVFI_NPROBE,
        KMP_Q,
        _vec_double,
        ensure_ivf_index_store,
    )

    store_path = ensure_ivf_index_store(spark, SF)
    cent = spark.read.parquet(store_path + "/centroids")
    lists = spark.read.parquet(store_path + "/lists")
    emb = table(spark, SF, "embeddings")
    xb = emb.where(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        F.posexplode(
            F.transform(_vec_double(), lambda xi: F.round(xi * KMP_Q, 0).cast("long"))
        ).alias("pos", "xq"),
    )
    pd_ = (
        xb.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum((F.col("xq") - F.col("cq")) * (F.col("xq") - F.col("cq")))
            .cast("long")
            .alias("dist")
        )
    )
    t("assign dists (noop)", lambda: noop(pd_))
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    pr = (
        pd_.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= IVFI_NPROBE)
        .select("vec_id", "cid")
    )
    t("probe sel (noop)", lambda: noop(pr))
    qarr = emb.select(
        "vec_id",
        F.transform(_vec_double(), lambda xi: F.round(xi * KMP_Q, 0).cast("long")).alias("q"),
    ).localCheckpoint()
    cand = pr.join(lists.select(F.col("vec_id").alias("hv"), "cid"), "cid").select(
        F.col("vec_id").alias("qv"), "hv"
    )
    t("cand (noop)", lambda: noop(cand))
    sq = F.zip_with("qa", "qb", lambda a, b: (a - b) * (a - b))
    dist = F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v).alias("dist")
    rer = (
        cand.join(qarr.select(F.col("vec_id").alias("qv"), F.col("q").alias("qa")), "qv")
        .join(qarr.select(F.col("vec_id").alias("hv"), F.col("q").alias("qb")), "hv")
        .select("qv", "hv", dist)
    )
    t("rerank zip_with (noop)", lambda: noop(rer))


def exp_F(spark):
    print("F. llm_ccnet_buckets: toks.count() vs sum-of-sizes")
    d = table(spark, SF, "documents").where(F.col("text").isNotNull())
    toks = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
    t("toks.count()", lambda: toks.count())
    t(
        "sum(size(split))",
        lambda: d.select(
            F.coalesce(F.sum(F.size(F.split("text", " "))), F.lit(0))
        ).collect(),
    )


def exp_G(spark):
    print("G. minhash signatures: HOF transforms vs explode+groupBy")
    from solarflare_etl_pipeline_spark.catalog import repartition_compute
    from solarflare_etl_pipeline_spark.operators.similarity import (
        MERSENNE,
        MINHASH_AB,
    )
    from solarflare_etl_pipeline_spark.operators.text import with_shingles

    base = with_shingles(
        repartition_compute(table(spark, SF, "documents"), "doc_id")
    ).select("doc_id", "shingles")

    def current():
        d = base.withColumn(
            "__h",
            F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 31))),
        )

        def affine(a, b):
            return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE)

        mins = [
            F.array_min(F.transform("__h", affine(a, b))).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
        return d.select("doc_id", *mins)

    def exploded():
        ex = base.select(
            "doc_id", F.explode("shingles").alias("s")
        ).select("doc_id", F.pmod(F.xxhash64("s"), F.lit(1 << 31)).alias("h"))
        mins = [
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE)).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
        return ex.groupBy("doc_id").agg(*mins)

    t("current HOF sigs (noop)", lambda: noop(current()))
    t("exploded codegen sigs (noop)", lambda: noop(exploded()))
    a = sorted(map(tuple, current().collect()))
    b = sorted(map(tuple, exploded().collect()))
    print(f"  equal={a == b} rows={len(a)}")


def exp_E2(spark):
    print("E2. ivf rerank: broadcast attach joins")
    from pyspark.sql import Window
    from solarflare_etl_pipeline_spark.operators.similarity import (
        IVFI_NPROBE,
        KMP_Q,
        _vec_double,
        ensure_ivf_index_store,
    )

    store_path = ensure_ivf_index_store(spark, SF)
    cent = spark.read.parquet(store_path + "/centroids")
    lists = spark.read.parquet(store_path + "/lists")
    emb = table(spark, SF, "embeddings")
    xb = emb.where(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        F.posexplode(
            F.transform(_vec_double(), lambda xi: F.round(xi * KMP_Q, 0).cast("long"))
        ).alias("pos", "xq"),
    )
    pd_ = (
        xb.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum((F.col("xq") - F.col("cq")) * (F.col("xq") - F.col("cq")))
            .cast("long")
            .alias("dist")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    pr = (
        pd_.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= IVFI_NPROBE)
        .select("vec_id", "cid")
    )
    qarr = emb.select(
        "vec_id",
        F.transform(_vec_double(), lambda xi: F.round(xi * KMP_Q, 0).cast("long")).alias("q"),
    ).localCheckpoint()
    cand = pr.join(lists.select(F.col("vec_id").alias("hv"), "cid"), "cid").select(
        F.col("vec_id").alias("qv"), "hv"
    )
    sq = F.zip_with("qa", "qb", lambda a, b: (a - b) * (a - b))
    dist = F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v).alias("dist")
    rer = (
        cand.join(
            F.broadcast(qarr.select(F.col("vec_id").alias("qv"), F.col("q").alias("qa"))),
            "qv",
        )
        .join(
            F.broadcast(qarr.select(F.col("vec_id").alias("hv"), F.col("q").alias("qb"))),
            "hv",
        )
        .select("qv", "hv", dist)
    )
    t("rerank bcast-attach zip_with (noop)", lambda: noop(rer))
    sq2 = F.expr(
        "aggregate(zip_with(qa, qb, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    ).alias("dist")
    rer2 = (
        cand.join(
            F.broadcast(qarr.select(F.col("vec_id").alias("qv"), F.col("q").alias("qa"))),
            "qv",
        )
        .join(
            F.broadcast(qarr.select(F.col("vec_id").alias("hv"), F.col("q").alias("qb"))),
            "hv",
        )
        .select("qv", "hv", sq2)
    )
    t("rerank bcast sql-expr (noop)", lambda: noop(rer2))


def exp_H(spark):
    print("H. graph edge build variants")
    edges = edges_df(spark)
    t("current SMJ self-join + distinct (noop)", lambda: noop(edges))
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")

    def collect_set_pairs():
        per = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("ps")
        )
        return (
            per.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ps, (x, i) -> "
                        "transform(slice(ps, i + 2, size(ps)), "
                        "y -> struct(x AS src, y AS dst))))"
                    )
                ).alias("p")
            )
            .select("p.src", "p.dst")
            .distinct()
        )

    t("collect_set + HOF pairs + distinct (noop)", lambda: noop(collect_set_pairs()))

    def bcast_self_join():
        a, b = li.alias("a"), li.alias("b")
        return (
            a.join(
                F.broadcast(b),
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
            .distinct()
        )

    t("broadcast self-join + distinct (noop)", lambda: noop(bcast_self_join()))
    a = sorted(map(tuple, edges.collect()))
    b = sorted(map(tuple, collect_set_pairs().collect()))
    print(f"  collect_set equal={a == b} rows={len(a)}")


def exp_I(spark):
    print("I. winnowing: window-count keep + bucket-group pair expansion")
    from pyspark.sql import Window
    from solarflare_etl_pipeline_spark.operators.similarity import (
        WINNOW_K,
        WINNOW_MAXDOC,
        WINNOW_MIN_SHARED,
        WINNOW_W,
    )
    from solarflare_etl_pipeline_spark.registry import load_all

    spec = load_all()["llm_winnowing_overlap"]
    t("full current op (noop)", lambda: noop(spec.spark(spark, SF)))

    def variant():
        d = table(spark, SF, "documents").where(
            F.length("text") >= WINNOW_K + WINNOW_W - 1
        )
        g = d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text") - WINNOW_K + 1)).alias("pos"),
        ).select(
            "doc_id",
            "pos",
            F.expr(f"substring(md5(substring(text, pos, {WINNOW_K})), 1, 15)").alias("h"),
        )
        wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
            -(WINNOW_W - 1), Window.currentRow
        )
        fps = (
            g.select("doc_id", "pos", F.min("h").over(wmin).alias("fp"))
            .where(F.col("pos") >= WINNOW_W)
            .select("doc_id", "fp")
            .distinct()
            .localCheckpoint()
        )
        wc = Window.partitionBy("fp")
        f2 = fps.withColumn("c", F.count("*").over(wc)).where(
            F.col("c") <= WINNOW_MAXDOC
        ).select("doc_id", "fp").localCheckpoint()
        sizes = f2.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
        buckets = f2.groupBy("fp").agg(
            F.sort_array(F.collect_list("doc_id")).alias("ds")
        )
        pairs = (
            buckets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ds, (x, i) -> "
                        "transform(slice(ds, i + 2, size(ds)), "
                        "y -> struct(x AS doc_a, y AS doc_b))))"
                    )
                ).alias("p")
            )
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").cast("long").alias("n_shared"))
            .where(F.col("n_shared") >= WINNOW_MIN_SHARED)
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("fp_a"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("fp_b"))
        return (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                "n_shared",
                "fp_a",
                "fp_b",
                F.expr("CAST(2000 * n_shared DIV (fp_a + fp_b) AS BIGINT)").alias(
                    "dice_milli"
                ),
            )
            .orderBy("doc_a", "doc_b")
        )

    t("variant (noop)", lambda: noop(variant()))
    a = [tuple(r) for r in spec.spark(spark, SF).collect()]
    b = [tuple(r) for r in variant().collect()]
    print(f"  equal={a == b} rows={len(a)}")


if __name__ == "__main__":
    spark = get_spark("r13-exp")
    table(spark, SF, "events").count()
    for name in sys.argv[1:]:
        globals()[f"exp_{name}"](spark)


def exp_C2(spark):
    print("C2. bpe full op after lazy-census + derived alpha")
    from solarflare_etl_pipeline_spark.registry import load_all

    spec = load_all()["llm_bpe_train_portable"]
    t("full op (count)", lambda: spec.spark(spark, SF).count(), n=3)


def exp_E3(spark):
    print("E3. ivf rerank: numpy mapInArrow vs zip_with")
    import pyarrow as pa
    from pyspark.sql import Window
    from solarflare_etl_pipeline_spark.operators.similarity import (
        IVFI_NPROBE,
        KMP_Q,
        _vec_double,
        ensure_ivf_index_store,
    )

    store_path = ensure_ivf_index_store(spark, SF)
    cent = spark.read.parquet(store_path + "/centroids")
    lists = spark.read.parquet(store_path + "/lists")
    emb = table(spark, SF, "embeddings")
    xb = emb.where(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        F.posexplode(
            F.transform(_vec_double(), lambda xi: F.round(xi * KMP_Q, 0).cast("long"))
        ).alias("pos", "xq"),
    )
    pd_ = (
        xb.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum((F.col("xq") - F.col("cq")) * (F.col("xq") - F.col("cq")))
            .cast("long")
            .alias("dist")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    pr = (
        pd_.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= IVFI_NPROBE)
        .select("vec_id", "cid")
    )
    qarr = emb.select(
        "vec_id",
        F.transform(_vec_double(), lambda xi: F.round(xi * KMP_Q, 0).cast("long")).alias("q"),
    ).localCheckpoint()
    cand = pr.join(lists.select(F.col("vec_id").alias("hv"), "cid"), "cid").select(
        F.col("vec_id").alias("qv"), "hv"
    )
    attached = cand.join(
        qarr.select(F.col("vec_id").alias("qv"), F.col("q").alias("qa")), "qv"
    ).join(qarr.select(F.col("vec_id").alias("hv"), F.col("q").alias("qb")), "hv")

    def sqdist_batches(batches):
        import numpy as np

        for batch in batches:
            qa = np.stack(batch.column("qa").to_numpy(zero_copy_only=False))
            qb = np.stack(batch.column("qb").to_numpy(zero_copy_only=False))
            d = qa - qb
            dist = np.einsum("ij,ij->i", d, d)
            yield pa.RecordBatch.from_arrays(
                [batch.column("qv"), batch.column("hv"), pa.array(dist, pa.int64())],
                names=["qv", "hv", "dist"],
            )

    rer_np = attached.mapInArrow(sqdist_batches, "qv long, hv long, dist long")
    t("rerank numpy mapInArrow (noop)", lambda: noop(rer_np))
    sq = F.zip_with("qa", "qb", lambda a, b: (a - b) * (a - b))
    dist = F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v).alias("dist")
    rer = attached.select("qv", "hv", dist)
    t("rerank zip_with (noop)", lambda: noop(rer))
    a = sorted(map(tuple, rer.collect()))
    b = sorted(map(tuple, rer_np.collect()))
    print(f"  equal={a == b} rows={len(a)}")
