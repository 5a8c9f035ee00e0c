"""Property-based tests (hypothesis): invariants the oracle can't state.

The reference's load contract (SURVEY.md R7) is an invariant, not a
fixed example: for ANY sequence of overlapping batches, replaying any
batch any number of times must never change the final keyed row set.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from solarflare_etl_pipeline_spark.sources.json_ingest import (
    idempotent_append,
    read_flare_json,
    transform_flares,
)

# small alphabets keep Spark job counts low while still exercising
# overlap, missing-field, and null patterns
_ids = st.integers(min_value=1, max_value=12)
_batch = st.lists(_ids, min_size=1, max_size=6, unique=True)


def _records(ids, drop_end_time=frozenset()):
    return [
        {
            "flrID": f"FLR-{i:03d}",
            "classType": "C1.0",
            "beginTime": f"2025-02-{(i % 27) + 1:02d}T01:00Z",
            "peakTime": f"2025-02-{(i % 27) + 1:02d}T01:30Z",
            **({} if i in drop_end_time else {"endTime": f"2025-02-{(i % 27) + 1:02d}T02:00Z"}),
            "sourceLocation": "S10W20",
            "activeRegionNum": None if i % 3 == 0 else 14000 + i,
            "link": f"https://example.invalid/{i}",
        }
        for i in ids
    ]


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(b1=_batch, b2=_batch, dropped=st.sets(_ids, max_size=4))
def test_idempotent_append_invariant(spark, tmp_path_factory, b1, b2, dropped):
    tmp = tmp_path_factory.mktemp("flares")
    p1, p2 = tmp / "b1.json", tmp / "b2.json"
    p1.write_text("\n".join(json.dumps(r) for r in _records(b1, dropped)))
    p2.write_text("\n".join(json.dumps(r) for r in _records(b2, dropped)))

    t1 = transform_flares(read_flare_json(spark, str(p1)))
    t2 = transform_flares(read_flare_json(spark, str(p2)))

    # load batch1, then batch2 twice: final keys must be union(b1, b2)
    state = idempotent_append(t1, None)
    state = state.unionByName(idempotent_append(t2, state))
    state = state.unionByName(idempotent_append(t2, state))

    keys = sorted(r.flr_id for r in state.select("flr_id").collect())
    expected = sorted(f"FLR-{i:03d}" for i in set(b1) | set(b2))
    assert keys == expected


def test_hash_split_is_stable_and_complete(spark, sf_dir):
    """sample_hash_split must be a pure function of the key: two runs
    agree row-for-row, every doc gets exactly one split, and the split
    ratios are within loose bounds of 80/10/10 (hash uniformity)."""
    from solarflare_etl_pipeline_spark.registry import load_all

    q = load_all()["sample_hash_split"].spark
    a = {r.doc_id: r.split for r in q(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in q(spark, sf_dir).collect()}
    assert a == b
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert 0.6 * n <= c["train"] <= 0.95 * n, c


def test_chunking_reassembles_documents(spark, sf_dir):
    """Chunks, concatenated in chunk_id order, must reproduce each
    document's token stream exactly — nothing dropped or duplicated."""
    from pyspark.sql import functions as F

    from solarflare_etl_pipeline_spark.catalog import table
    from solarflare_etl_pipeline_spark.registry import load_all

    chunks = load_all()["llm_chunk_docs"].spark(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text, r.chunk_tokens))
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert set(by_doc) == set(docs)
    for doc_id, parts in by_doc.items():
        parts.sort()
        assert [cid for cid, _, _ in parts] == list(range(len(parts)))
        rebuilt = " ".join(text for _, text, _ in parts)
        assert rebuilt == docs[doc_id], f"doc {doc_id} chunk reassembly mismatch"
        # every chunk except the last is full-size
        sizes = [n for _, _, n in parts]
        assert all(s == sizes[0] or i == len(sizes) - 1 for i, s in enumerate(sizes)) or len(sizes) == 1
