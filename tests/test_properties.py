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


# ---------------------------------------------------------------------------
# Round-6 operator math, re-derived in pure Python and checked against
# the same primitives the SQL uses (md5 16-bit buckets, Morton masks,
# rank formulas) — invariants the fixture data alone can't stress.
# ---------------------------------------------------------------------------

import hashlib


def _h16(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _spread16(x: int) -> int:
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


@settings(max_examples=200, deadline=None)
@given(a=st.integers(0, 65535), b=st.integers(0, 65535),
       c=st.integers(0, 65535), d=st.integers(0, 65535))
def test_morton_interleave_is_injective(a, b, c, d):
    """maintenance_zorder's magic-number interleave must be a bijection
    16+16 -> 32 bits: distinct (a,b) pairs get distinct zkeys, and the
    inverse (compress even/odd bits) recovers the inputs exactly."""
    z1 = _spread16(a) | (_spread16(b) << 1)
    z2 = _spread16(c) | (_spread16(d) << 1)
    assert (z1 == z2) == ((a, b) == (c, d))

    def compress(x):
        x &= 0x55555555
        x = (x | (x >> 1)) & 0x33333333
        x = (x | (x >> 2)) & 0x0F0F0F0F
        x = (x | (x >> 4)) & 0x00FF00FF
        x = (x | (x >> 8)) & 0x0000FFFF
        return x

    assert compress(z1) == a and compress(z1 >> 1) == b


@settings(max_examples=50, deadline=None)
@given(keys=st.lists(st.integers(0, 300), min_size=1, max_size=400))
def test_cms_never_undercounts(keys):
    """agg_cms_heavy_hitters' guarantee on ARBITRARY multisets (the
    fixture only exercises one distribution): with the same md5
    bucketing (depth 4, width 1024), min-over-rows estimate >= exact
    count for every key, with equality when no collision hit the key."""
    DEPTH, WIDTH = 4, 1024
    cells: dict[tuple[int, int], int] = {}
    from collections import Counter

    exact = Counter(str(k) for k in keys)
    for k, n in exact.items():
        for s in range(DEPTH):
            b = _h16(f"{s}:{k}") % WIDTH
            cells[(s, b)] = cells.get((s, b), 0) + n
    for k, n in exact.items():
        est = min(cells[(s, _h16(f"{s}:{k}") % WIDTH)] for s in range(DEPTH))
        assert est >= n


@settings(max_examples=50, deadline=None)
@given(
    members=st.sets(st.integers(0, 10000), max_size=60),
    probes=st.sets(st.integers(0, 10000), max_size=120),
)
def test_bloom_has_no_false_negatives(members, probes):
    """agg_bloom_membership's theorem on arbitrary sets: every member
    probe passes; non-member false positives are possible but bounded
    away from certainty for these sizes (not asserted — only the FN
    side is a theorem)."""
    K, M = 3, 1024
    bits = {(s, _h16(f"{s}:{k}") % M) for k in members for s in range(K)}
    for k in members | probes:
        maybe = all((s, _h16(f"{s}:{k}") % M) in bits for s in range(K))
        if k in members:
            assert maybe, "Bloom false negative — impossible by construction"


@settings(max_examples=100, deadline=None)
@given(
    text=st.text(alphabet="ab c", max_size=60),
    vocab=st.sets(
        st.text(alphabet="ab c", min_size=2, max_size=2), max_size=8
    ),
)
def test_greedy_tokenizer_invariants(text, vocab):
    """llm_tokenizer_apply's scan on arbitrary text/vocab: roundtrip
    always reconstructs, and every pair token saves exactly one single
    token (n_tokens = n_chars - n_pair_tokens)."""
    from solarflare_etl_pipeline_spark.operators.text import _greedy_pair_tokenize

    n_tok, n_pair, ok = _greedy_pair_tokenize(text, frozenset(vocab))
    assert ok
    assert n_tok == len(text) - n_pair


@settings(max_examples=100, deadline=None)
@given(xs=st.lists(st.integers(0, 10**6), min_size=2, max_size=200))
def test_gini_rank_formula_bounds(xs):
    """agg_gini's rank formula on arbitrary spend vectors: G in [0, 1),
    exactly 0 for constant vectors, and tie-invariant (permuting equal
    values never changes the sum-over-tie-block)."""
    xs_sorted = sorted(xs)
    n, sx = len(xs_sorted), sum(xs_sorted)
    if sx == 0:
        return
    six = sum(i * x for i, x in enumerate(xs_sorted, start=1))
    g = 2.0 * six / (n * sx) - (n + 1.0) / n
    assert -1e-12 <= g < 1.0
    if len(set(xs_sorted)) == 1:
        assert abs(g) < 1e-12


@settings(max_examples=60, deadline=None)
@given(xs=st.lists(st.integers(-1000, 1000), min_size=3, max_size=100, unique=True))
def test_spearman_is_plus_minus_one_on_monotone(xs):
    """agg_spearman's formula: any strictly monotone relationship gives
    exactly +1 (and its reversal -1) — the defining property Pearson
    lacks."""

    def spearman(pairs):
        n = len(pairs)
        rx = {v: i for i, v in enumerate(sorted(p[0] for p in pairs), 1)}
        ry = {v: i for i, v in enumerate(sorted(p[1] for p in pairs), 1)}
        sx = sy = sxy = sxx = syy = 0
        for a, b in pairs:
            i, j = rx[a], ry[b]
            sx += i; sy += j; sxy += i * j; sxx += i * i; syy += j * j
        num = n * sxy - sx * sy
        den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
        return num / den

    up = [(x, x * 3 + 7) for x in xs]       # strictly increasing map
    down = [(x, -2 * x + 1) for x in xs]    # strictly decreasing map
    assert abs(spearman(up) - 1.0) < 1e-9
    assert abs(spearman(down) + 1.0) < 1e-9


@settings(max_examples=100, deadline=None)
@given(
    counts=st.lists(st.integers(1, 10**6), min_size=1, max_size=60),
    budget=st.integers(1, 10**7),
)
def test_largest_remainder_allocation_properties(counts, budget):
    """agg_proportional_allocate's method on arbitrary group sizes:
    allocations are non-negative, sum EXACTLY to the budget, and each
    is within one unit of the real-valued proportional share."""
    total = sum(counts)
    floors = [c * budget // total for c in counts]
    rems = [(-(c * budget % total), i) for i, c in enumerate(counts)]
    leftover = budget - sum(floors)
    assert 0 <= leftover < len(counts) or len(counts) == 1
    order = sorted(range(len(counts)), key=lambda i: rems[i])
    alloc = list(floors)
    for i in order[:leftover]:
        alloc[i] += 1
    assert sum(alloc) == budget
    for c, a in zip(counts, alloc):
        exact = budget * c / total
        assert exact - 1 < a < exact + 1
        assert a >= 0


@settings(max_examples=100, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 10**4), st.integers(1, 50)),
        min_size=1,
        max_size=100,
    )
)
def test_weighted_median_definition(data):
    """agg_weighted_median's cum*2 >= tot rule on arbitrary
    (value, weight) multisets: at least half the total weight lies at
    or below the reported median, and strictly less than half lies
    strictly below it (the defining sandwich of the lower weighted
    median)."""
    from collections import defaultdict

    acc = defaultdict(int)
    for v, w in data:
        acc[v] += w
    tot = sum(acc.values())
    cum = 0
    med = None
    for v in sorted(acc):
        cum += acc[v]
        if cum * 2 >= tot:
            med = v
            break
    below = sum(w for v, w in acc.items() if v < med)
    at_or_below = below + acc[med]
    assert at_or_below * 2 >= tot
    assert below * 2 < tot


@settings(max_examples=100, deadline=None)
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(1, 120)),
        min_size=1,
        max_size=80,
    )
)
def test_interval_merge_islands_are_maximal(iv):
    """ts_interval_merge's running-max boundary rule on arbitrary
    (start, length) interval sets: islands are disjoint with strict
    gaps between them, cover every interval, and no interval spans an
    island boundary."""
    spans = sorted((s, s + l) for s, l in iv)
    islands = []
    for s, e in spans:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
        else:
            islands.append([s, e, 1])
    assert sum(i[2] for i in islands) == len(spans)
    for (s1, e1, _), (s2, e2, _) in zip(islands, islands[1:]):
        assert s2 > e1
    for s, e in spans:
        assert any(i[0] <= s and e <= i[1] for i in islands)


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 10), st.integers(1, 500)),
        min_size=4,
        max_size=120,
    )
)
def test_ols_normal_equations_give_least_squares(rows):
    """agg_ols2's centered Cramer solution on arbitrary (x, d, noise)
    data: the normal-equation coefficients minimize squared error —
    perturbing either slope must not reduce the residual sum."""
    n = len(rows)
    ps = [3 * x - 2 * d + e for x, d, e in rows]
    xs = [x for x, _, _ in rows]
    ds = [d for _, d, _ in rows]
    sx, sd, sp = sum(xs), sum(ds), sum(ps)
    sxx = sum(x * x for x in xs)
    sdd = sum(d * d for d in ds)
    sxd = sum(x * d for x, d in zip(xs, ds))
    spx = sum(p * x for p, x in zip(ps, xs))
    spd = sum(p * d for p, d in zip(ps, ds))
    cxx, cdd = n * sxx - sx * sx, n * sdd - sd * sd
    cxd = n * sxd - sx * sd
    cpx, cpd = n * spx - sp * sx, n * spd - sp * sd
    det = cxx * cdd - cxd * cxd
    if det == 0:
        return
    b1 = (cpx * cdd - cpd * cxd) / det
    b2 = (cpd * cxx - cpx * cxd) / det
    b0 = (sp - b1 * sx - b2 * sd) / n

    def sse(a0, a1, a2):
        return sum((p - a0 - a1 * x - a2 * d) ** 2 for p, x, d in zip(ps, xs, ds))

    base = sse(b0, b1, b2)
    eps = 1e-3
    assert base <= sse(b0, b1 + eps, b2) + 1e-9
    assert base <= sse(b0, b1 - eps, b2) + 1e-9
    assert base <= sse(b0, b1, b2 + eps) + 1e-9
    assert base <= sse(b0, b1, b2 - eps) + 1e-9


@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(st.integers(0, 50), min_size=1, max_size=80),
    b=st.lists(st.integers(0, 50), min_size=1, max_size=80),
)
def test_mann_whitney_identity_and_bounds(a, b):
    """The 2x-scaled tied-rank construction on arbitrary samples:
    2U_a + 2U_b == 2 n_a n_b always, and 0 <= 2U <= 2 n_a n_b."""
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    merged = Counter(a) + Counter(b)
    rank2, below = {}, 0
    for v in sorted(merged):
        rank2[v] = 2 * below + merged[v] + 1
        below += merged[v]
    na, nb = len(a), len(b)
    u2a = sum(c * rank2[v] for v, c in ca.items()) - na * (na + 1)
    u2b = sum(c * rank2[v] for v, c in cb.items()) - nb * (nb + 1)
    assert u2a + u2b == 2 * na * nb
    assert 0 <= u2a <= 2 * na * nb


@settings(max_examples=100, deadline=None)
@given(
    a=st.lists(st.integers(0, 50), min_size=1, max_size=80),
    b=st.lists(st.integers(0, 50), min_size=1, max_size=80),
)
def test_ks_numerator_bounds_and_identical_samples(a, b):
    """KS cross-multiplied numerator on arbitrary samples: within
    [0, n_a*n_b], zero iff the ECDFs coincide on the grid — in
    particular exactly zero when a == b as multisets."""
    import bisect

    sa, sb = sorted(a), sorted(b)
    na, nb = len(sa), len(sb)
    grid = sorted(set(sa) | set(sb))
    d_num = max(
        abs(bisect.bisect_right(sa, v) * nb - bisect.bisect_right(sb, v) * na)
        for v in grid
    )
    assert 0 <= d_num <= na * nb
    if sorted(a) == sorted(b):
        assert d_num == 0


@given(
    n=st.integers(min_value=1, max_value=10_000),
    k=st.integers(min_value=1, max_value=128),
    rank=st.integers(min_value=1, max_value=10_000),
)
@settings(max_examples=300, deadline=None)
def test_exact_ntile_formula_matches_definition(n, k, rank):
    """plans/rank.exact_ntile's integer arithmetic == the SQL NTILE
    definition (first n%k buckets take floor(n/k)+1 rows, the rest
    floor(n/k)) — pure-Python re-derivation, no Spark session."""
    if rank > n:
        return
    # the definition, built by materializing bucket sizes
    q, r = divmod(n, k)
    sizes = [q + 1] * r + [q] * (k - r)
    acc, expected = 0, None
    for b, s in enumerate(sizes, start=1):
        acc += s
        if rank <= acc:
            expected = b
            break
    # the closed form the Spark expression implements
    threshold = r * (q + 1)
    if rank <= threshold:
        got = (rank - 1) // (q + 1) + 1
    else:
        got = r + (rank - threshold - 1) // max(q, 1) + 1
    assert got == expected, (n, k, rank)


@given(st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=300, deadline=None)
def test_avro_zigzag_roundtrip(v):
    from solarflare_etl_pipeline_spark.sources.avro_ingest import (
        zigzag_decode,
        zigzag_encode,
    )

    buf = zigzag_encode(v) + b"\x99"
    got, pos = zigzag_decode(buf, 0)
    assert got == v and pos == len(buf) - 1


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.text(max_size=40),
            st.sampled_from(["en", "de", "zh", ""]),
            st.text(max_size=10),
            st.integers(min_value=-(2**40), max_value=2**40),
        ),
        max_size=200,
    )
)
@settings(max_examples=60, deadline=None)
def test_avro_ocf_roundtrip_arbitrary_rows(rows):
    """write_ocf ∘ read_ocf == identity for arbitrary unicode strings
    (incl. surrogate-free astral chars hypothesis generates) and signed
    longs, across block boundaries."""
    import io
    import os
    import tempfile

    from solarflare_etl_pipeline_spark.sources.avro_ingest import read_ocf, write_ocf

    fh = io.BytesIO()
    write_ocf(rows, fh)
    with tempfile.NamedTemporaryFile(suffix=".avro", delete=False) as tf:
        tf.write(fh.getvalue())
        path = tf.name
    try:
        assert list(read_ocf(path)) == [tuple(r) for r in rows]
    finally:
        os.unlink(path)
