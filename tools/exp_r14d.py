"""Round-14 A/B: pre-r14 vs r14 forms of llm_split_leakage,
llm_contamination_report, llm_ccnet_buckets and the maintenance ledgers,
both variants in ONE session, interleaved runs (the r13 box-noise
protocol). The OLD forms are copied verbatim from the r13 tree (git
b60329e); the NEW forms run via the registry. Collect-equality of
old-vs-new is certified by the DuckDB oracle separately (run.py).

Measurement-only tooling.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import repartition_compute, table
from solarflare_etl_pipeline_spark.operators.text import (
    CONTAM_NGRAM,
    LEAK_NGRAM,
    LEAK_PAIR_MAXDF,
)
from solarflare_etl_pipeline_spark.registry import load_all
from solarflare_etl_pipeline_spark.session import get_spark


def split_leakage_old(spark, sf_dir):
    d = repartition_compute(table(spark, sf_dir, "documents"), "doc_id")
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    sh = (
        d.select(
            "doc_id",
            b.alias("b"),
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(split(text, ' ')) - {LEAK_NGRAM - 1}),"
                        f" i -> concat_ws(' ', slice(split(text, ' '), i, {LEAK_NGRAM})))"
                    )
                )
            ).alias("sh"),
        )
        .localCheckpoint()
    )
    train_sh = sh.where(F.col("b") < 8).select("sh", F.col("doc_id").alias("trdoc")).distinct()
    test_sh = sh.where(F.col("b") >= 8).select("doc_id", "sh")
    sizes = test_sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    hits = (
        test_sh.join(train_sh.select("sh").distinct(), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").cast("long").alias("n_hit"))
    )
    rare = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= LEAK_PAIR_MAXDF)
        .select("sh")
    )
    pair = (
        test_sh.join(rare, "sh", "left_semi")
        .join(train_sh, "sh")
        .groupBy(F.col("doc_id").alias("tdoc"), "trdoc")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("tdoc").orderBy(F.col("c").desc(), "trdoc")
            ),
        )
        .where(F.col("rk") == 1)
    )
    return (
        hits.join(sizes, "doc_id")
        .join(pair, hits["doc_id"] == pair["tdoc"], "left")
        .select(
            "doc_id",
            "n_sh",
            "n_hit",
            F.expr("CAST(n_hit * 1000 DIV n_sh AS BIGINT)").alias("containment_milli"),
            F.col("trdoc").alias("worst_train_doc"),
            F.col("c").alias("n_shared_worst"),
        )
        .orderBy("doc_id")
    )


def contamination_old(spark, sf_dir):
    d = repartition_compute(table(spark, sf_dir, "documents"), "doc_id").withColumn(
        "toks", F.split("text", " ")
    )
    sh = (
        d.where(F.expr(f"size(toks) >= {CONTAM_NGRAM}"))
        .select(
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {CONTAM_NGRAM - 1}),"
                    f" i -> concat_ws(' ', slice(toks, i, {CONTAM_NGRAM})))"
                )
            ).alias("g"),
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = sh.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "g")
    b = sh.select(F.col("source").alias("src_b"), "g")
    shared = (
        a.join(b, "g")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    na = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
            (F.col("n_shared").cast("double") / F.least("n_a", "n_b")).alias(
                "containment"
            ),
        )
    )


def ccnet_old(spark, sf_dir):
    from solarflare_etl_pipeline_spark.plans.rank import with_grouped_prefix_sum

    d = repartition_compute(table(spark, sf_dir, "documents"), "doc_id").where(
        F.col("text").isNotNull()
    )
    toks = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    n_total = toks.count()
    terms = toks.join(vocab, "tok").select(
        "doc_id",
        "lang",
        F.round(F.log(F.col("cnt").cast("double") / F.lit(float(n_total))), 9)
        .cast("decimal(28,12)")
        .alias("term"),
    )
    scored = terms.groupBy("doc_id", "lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(-F.sum("term").cast("double") / F.count("*"), 6).alias("nll"),
    )
    lang_n = scored.groupBy("lang").agg(F.count("*").cast("long").alias("n_l"))
    grid = scored.groupBy("lang", "nll").agg(F.count("*").alias("c"))
    cum = with_grouped_prefix_sum(
        grid, ["lang"], ["nll"], "c", sum_col="cum_through"
    ).select("lang", "nll", "cum_through")
    lab = cum.join(F.broadcast(lang_n), "lang").select(
        "lang",
        "nll",
        F.when(F.col("cum_through") <= F.expr("(n_l + 2) DIV 3"), "head")
        .when(F.col("cum_through") <= F.expr("(2 * n_l + 2) DIV 3"), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )
    return (
        scored.join(lab, ["lang", "nll"])
        .select("doc_id", "lang", "n_tokens", "nll", "ppl_bucket")
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-rewrite-ab")
    specs = load_all()
    table(spark, sf_dir, "events").count()  # warm

    pairs = {
        "split_leakage": (split_leakage_old, specs["llm_split_leakage"].spark),
        "contamination": (contamination_old, specs["llm_contamination_report"].spark),
        "ccnet": (ccnet_old, specs["llm_ccnet_buckets"].spark),
    }
    only = os.environ.get("R14_AB_ONLY")
    if only:
        pairs = {k: v for k, v in pairs.items() if k in only.split(",")}
    for run in range(3):
        for tag, (old, new) in pairs.items():
            for form, fn in (("old", old), ("new", new)):
                spark.sparkContext.setJobDescription(f"{tag}:{form}:{run}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                print(
                    f"[ab] {tag} {form} run{run}: {time.perf_counter() - t0:.2f}s",
                    flush=True,
                )
                spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
