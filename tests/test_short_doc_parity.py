"""Short-document parity probe — the latent-divergence class where
Spark's inclusive `sequence(1, greatest(1, n-k))` emits a truncated
shingle for docs shorter than the n-gram width while DuckDB's
exclusive `RANGE` emits none (found in round 7 while reviewing
llm_contamination_report; same family as the ingest_json_corrupt
fixed-truncation advice item). Every shingling/chunking operator must
agree with its oracle on documents of 1..N tokens, not just the
long-doc fixtures.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from solarflare_etl_pipeline_spark.registry import load_all

SPECS = load_all()

#: Token-stream operators whose oracles do per-doc shingling/chunking.
SHINGLING_OPS = (
    "llm_contamination_report",
    "llm_rouge_overlap",
    "llm_paragraph_dedup",
    "llm_chunk_docs",
    "llm_vocab_coverage",
    "llm_data_card",
    "llm_minhash_portable",
)


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("tiny_sf"))
    rows = [
        (1, "one", "en", "src0", 3),                 # 1 token
        (2, "two words", "en", "src1", 9),           # 2 tokens
        (3, "three tokens here", "de", "src0", 17),  # 3 tokens
        (4, "a b c d e f", "de", "src1", 11),
        (5, "a b c d e g", "fr", "src2", 11),        # near-dup of 4
        (6, "a b c d e f", "fr", "src2", 11),        # exact dup of 4
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


@pytest.mark.parametrize("name", SHINGLING_OPS)
def test_short_doc_parity(spark, tiny_sf, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tiny_sf}/documents.parquet/*.parquet')"
    )
    sdf = SPECS[name].spark(spark, tiny_sf)
    srows = sorted([tuple(r) for r in sdf.collect()])
    orows = sorted([tuple(r) for r in con.sql(SPECS[name].oracle).fetchall()])
    assert srows == orows, f"{name}: spark={srows[:3]} oracle={orows[:3]}"
