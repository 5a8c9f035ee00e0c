"""10x scale-proof sweep (VERDICT r11 task #4).

Synthesizes a seeded 1x fixture shaped like the driver's sf0.1 tables
(distributions matched to the parquet stats in TESTDATA.md/FIXTURES.md:
30-word uniform vocabulary + rare 'dup' marker, 10-100-word documents,
5 langs / 20 sources, 4-line orders over a part pool that scales with
corpus size, planted exact-duplicate pairs at a constant 2% rate so
near-dup pair counts grow linearly) and a 10x fixture from the SAME
generator, then times the five most expensive operator families at both
scales and asserts the growth curve is ~linear (generous <= 15x bound +
a fixed grace for scheduler noise). For llm_pack_ffd_portable it
additionally asserts the driver-side assignment ledger stays FLAT: the
size-class histogram is bounded by CHUNK_TOKENS at any corpus size, so
ledger cost and row count must be scale-independent.

OPT-IN — not part of the default suite (it synthesizes ~6M rows and
runs ~10 minutes):

    SPARK_GRAFT_SCALE_SWEEP=1 python -m pytest tests/test_scale_sweep.py -s

Measured curves are recorded in SCALING.md §"Measured 1x -> 10x sweep".
"""

from __future__ import annotations

import json
import os
import time
from collections import Counter

import pytest

SWEEP = bool(os.environ.get("SPARK_GRAFT_SCALE_SWEEP"))
pytestmark = pytest.mark.skipif(
    not SWEEP, reason="opt-in 10x scale sweep (set SPARK_GRAFT_SCALE_SWEEP=1)"
)

#: The five most expensive registered families per the r11 steady bench,
#: plus the round-12 incremental pair (their steady cost must scale with
#: the BATCH, which grows 10x here like everything else — the best-of-two
#: protocol charges the one-time store build to the discarded first run).
SWEEP_OPS = (
    "llm_pack_ffd_portable",
    "graph_k_core_portable",
    "graph_cc_portable",
    "llm_winnowing_overlap",
    "llm_dedup_simhash_pairs",
    "llm_pack_ffd_incremental",
    "graph_cc_incremental",
)

N_DOCS_1X = 5_000  # sf0.1 documents rows
N_LINE_1X = 600_000  # sf0.1 lineitem rows
MULT = 10
RATIO_BOUND = 15.0  # generous ~linear bound (10x data)
GRACE_SEC = 3.0  # fixed scheduler-noise allowance on the 10x side

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()


def _synth(spark, out_dir: str, mult: int) -> None:
    """Deterministic seeded fixture: documents + lineitem parquet."""
    from pyspark.sql import functions as F

    n_docs = N_DOCS_1X * mult
    n_line = N_LINE_1X * mult
    n_parts = 20_000 * mult  # part pool scales with SF like TPC-H
    words_sql = "array(" + ",".join(f"'{w}'" for w in VOCAB) + ")"

    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            # planted exact-duplicate pairs at a constant 2% rate:
            # doc_id % 100 == 1 copies the text of doc_id - 1
            F.expr("CASE WHEN id % 100 = 1 THEN id - 1 ELSE id END").alias(
                "seed"
            ),
        )
        .select(
            "doc_id",
            F.expr(
                f"array_join(transform(sequence(1, 10 + pmod(xxhash64(seed, 11), 91)),"
                f" i -> element_at({words_sql},"
                f" 1 + cast(pmod(xxhash64(seed * 1000 + i, 13), {len(VOCAB)}) as int))),"
                f" ' ')"
            ).alias("text"),
            F.expr(
                "element_at(array('en','en','de','zh','fr','es'),"
                " 1 + cast(pmod(xxhash64(seed, 17), 6) as int))"
            ).alias("lang"),
            F.expr("concat('src', pmod(xxhash64(seed, 19), 20))").alias(
                "source"
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    docs.coalesce(max(1, mult)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    line = spark.range(n_line).select(
        F.expr("id DIV 4").alias("l_orderkey"),
        F.expr(f"pmod(xxhash64(id, 23), {n_parts})").alias("l_partkey"),
    )
    line.write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )


@pytest.fixture(scope="module")
def sweep_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("scale_sweep")
    d1, d10 = str(base / "x1"), str(base / "x10")
    _synth(spark, d1, 1)
    _synth(spark, d10, MULT)
    return d1, d10


def _best_of_two(fn) -> float:
    ts = []
    for _ in range(2):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def test_scale_sweep_linear(spark, sweep_dirs, tmp_path):
    from solarflare_etl_pipeline_spark.registry import load_all

    specs = load_all()
    d1, d10 = sweep_dirs
    curve = {}
    for name in SWEEP_OPS:
        q = specs[name].spark
        t1 = _best_of_two(lambda: q(spark, d1).count())
        t10 = _best_of_two(lambda: q(spark, d10).count())
        if t10 > RATIO_BOUND * t1 + GRACE_SEC:
            # One retry before failing: SCALING.md records a contended
            # run hitting 14.4x (within 4% of the bound) on a shared
            # box — re-measure both legs so one noisy sample doesn't
            # fail the sweep (ADVICE r12 #4).
            t1 = min(t1, _best_of_two(lambda: q(spark, d1).count()))
            t10 = min(t10, _best_of_two(lambda: q(spark, d10).count()))
        ratio = t10 / t1 if t1 > 0 else float("inf")
        curve[name] = {
            "t_1x_sec": round(t1, 2),
            "t_10x_sec": round(t10, 2),
            "ratio": round(ratio, 2),
        }
        print(f"{name}: 1x {t1:.2f}s  10x {t10:.2f}s  ratio {ratio:.2f}")
        assert t10 <= RATIO_BOUND * t1 + GRACE_SEC, (
            f"{name}: 10x data cost {t10:.2f}s vs 1x {t1:.2f}s — "
            f"superlinear growth (> {RATIO_BOUND}x + {GRACE_SEC}s grace)"
        )
    # Default to tmp_path so the opt-in run doesn't mutate the working
    # tree as a pytest side effect; set SPARK_GRAFT_SWEEP_WRITE=1 to
    # refresh the committed repo-root curve (ADVICE r12 #4).
    if os.environ.get("SPARK_GRAFT_SWEEP_WRITE"):
        out = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "SCALING_SWEEP.json"
        )
    else:
        out = str(tmp_path / "SCALING_SWEEP.json")
    with open(out, "w") as f:
        json.dump(curve, f, indent=1, sort_keys=True)
    print(f"curve written to {out}")


def test_ffd_ledger_overhead_flat(sweep_dirs):
    """The FFD assignment ledger is corpus-size-INDEPENDENT: the
    size-class histogram has <= CHUNK_TOKENS rows at any scale, so the
    driver-side rounds must cost the same (sub-millisecond) and emit a
    bounded row count at 1x and 10x."""
    import duckdb

    from solarflare_etl_pipeline_spark.operators.text import (
        CHUNK_TOKENS,
        PACK_BUDGET,
        ffd_assignment_ledger,
    )

    d1, d10 = sweep_dirs
    stats = {}
    for tag, d in (("1x", d1), ("10x", d10)):
        rows = duckdb.sql(
            f"SELECT LEN(STRING_SPLIT(text, ' ')) AS n, COUNT(*) AS c "
            f"FROM read_parquet('{d}/documents.parquet/*.parquet') GROUP BY 1"
        ).fetchall()
        hist: Counter = Counter()
        for n, c in rows:
            hist[CHUNK_TOKENS] += (n // CHUNK_TOKENS) * c
            if n % CHUNK_TOKENS:
                hist[n % CHUNK_TOKENS] += c
        assert len(hist) <= CHUNK_TOKENS  # bounded input, any corpus size
        # Best of 3 batches of 100 calls: the wall-clock bound below is
        # box-load-sensitive (ADVICE r12 #4) — take the least-contended
        # sample rather than one fixed batch.
        per_call = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(100):
                ledger, _ = ffd_assignment_ledger(
                    dict(hist), PACK_BUDGET, CHUNK_TOKENS
                )
            per_call = min(per_call, (time.time() - t0) / 100)
        stats[tag] = (per_call, len(ledger))
        print(f"ffd ledger {tag}: {per_call * 1000:.3f} ms, {len(ledger)} rows")
    # FLAT: bounded row count and sub-millisecond cost at BOTH scales —
    # not merely "grew slower than the data".
    for tag, (per_call, n_rows) in stats.items():
        assert per_call < 0.05, f"ledger not flat at {tag}: {per_call:.3f}s"
        assert n_rows <= 6 * CHUNK_TOKENS, f"ledger rows unbounded at {tag}"
