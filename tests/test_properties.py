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
