"""Round-14 A/B: simhash vote-pack term construction (VERDICT r13 #5).

Current (shift form): per 64-bit sum slot, each of 3 fields is built as
shiftleft(shiftright(h, b) & 1, 20*j) and added — ~10 expression ops per
slot, 20 slots. Candidate (mul form): extract the slot's 3 adjacent bits
once ((h >> 3s) & 7) and SPREAD them to bit positions 0/20/40 with one
multiply + mask:  ((h>>3s) & 7) * (1 + 2^19 + 2^38) & (1 | 2^20 | 2^40).

Proof of equality (exact integer, no carries): with x = x0 + 2*x1 + 4*x2,
x*M = x0*(1+2^19+2^38) + x1*(2+2^20+2^39) + x2*(4+2^21+2^40); the mask
keeps bits {0, 20, 40}, which receive exactly x0, x1, x2 (every other
term lands on a different bit, so nothing carries into the kept bits).

Runs both variants' full signature pass (count() over per-doc packs) in
ONE session, 3 runs each interleaved, plus a collect-equality check of
the resulting signatures. Measurement-only tooling.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import repartition_compute, table
from solarflare_etl_pipeline_spark.operators.similarity import (
    SIMHASH_FIELD_BITS,
    SIMHASH_FIELDS_PER_SLOT,
    SIMHASH_N_SLOTS,
)
from solarflare_etl_pipeline_spark.operators.text import with_shingles
from solarflare_etl_pipeline_spark.session import get_spark

def _toks(spark, sf_dir):
    docs = repartition_compute(table(spark, sf_dir, "documents"), "doc_id")
    toks = with_shingles(docs).select("doc_id", F.explode("shingles").alias("tok"))
    return toks.withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )


def packs_shift():
    packs = []
    for s in range(SIMHASH_N_SLOTS):
        terms = None
        for j in range(SIMHASH_FIELDS_PER_SLOT):
            b = s * SIMHASH_FIELDS_PER_SLOT + j
            term = F.shiftleft(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)),
                SIMHASH_FIELD_BITS * j,
            )
            terms = term if terms is None else terms + term
        packs.append(F.sum(terms).alias(f"p{s}"))
    return packs


def packs_mul():
    mul = 1 + (1 << (SIMHASH_FIELD_BITS - 1)) + (1 << (2 * SIMHASH_FIELD_BITS - 2))
    mask = 1 | (1 << SIMHASH_FIELD_BITS) | (1 << (2 * SIMHASH_FIELD_BITS))
    packs = []
    for s in range(SIMHASH_N_SLOTS):
        x = F.shiftright(F.col("h"), s * SIMHASH_FIELDS_PER_SLOT).bitwiseAND(
            F.lit((1 << SIMHASH_FIELDS_PER_SLOT) - 1)
        )
        spread = (x * F.lit(mul)).bitwiseAND(F.lit(mask))
        packs.append(F.sum(spread).alias(f"p{s}"))
    return packs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-simhash-ab")
    table(spark, sf_dir, "events").count()  # warm

    toks = _toks(spark, sf_dir)
    variants = {"shift": packs_shift(), "mul": packs_mul()}

    # equality first
    a = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *variants["shift"])
    b = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *variants["mul"])
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb, "pack variants disagree!"
    print(f"[ab] equality OK over {len(ra)} docs")

    for run in range(3):
        for tag, packs in variants.items():
            df = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *packs)
            spark.sparkContext.setJobDescription(f"simhash-pack:{tag}:{run}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"[ab] {tag} run{run}: {time.perf_counter() - t0:.2f}s", flush=True)
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
