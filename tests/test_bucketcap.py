"""Skew protection for LSH band buckets (stages/bucketcap.py).

The scale hazard: boilerplate-heavy corpora put thousands of near-identical
docs into one band bucket; an unbounded map_groups over that bucket is one
quadratic straggler task.  capped_group_pairs decomposes oversized buckets
EXACTLY (triangle chunk-pair tasks), so these tests assert (a) the pure
decomposition covers every pair exactly once, (b) each family's pair set is
bit-identical capped vs uncapped on a mixed corpus whose hot bucket exceeds
the cap, and (c) a ≥1000-identical-doc pathological corpus completes with
bounded per-task group sizes and the exact expected pair count.
"""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from crawl4ai_ray.stages.bucketcap import chunk_of, task_pairs_indices
from crawl4ai_ray.stages.dedup import minhash_candidate_pairs, simhash_neardup_pairs
from crawl4ai_ray.stages.similarity import lsh_bucket_pairs, lsh_neardup_pairs

UNCAPPED = 10**9


# ------------------------------------------------------------ pure helpers
@pytest.mark.parametrize("n,c", [(1, 5), (5, 5), (6, 5), (13, 4), (100, 7), (1000, 64)])
def test_hash_chunk_tasks_cover_every_pair_exactly_once(n, c):
    """The routing decomposition: rows hash-chunk into m groups; every
    unordered chunk pair (i ≤ j) is one task emitting task_pairs_indices
    over its id-sorted rows.  The union must be the exact triangle of the
    bucket, each pair exactly once, with balanced task sizes."""
    m = math.ceil(n / c)
    ids = np.arange(100, 100 + n, dtype=np.int64)  # arbitrary id space
    chunks = chunk_of(ids, m)
    assert ((chunks >= 0) & (chunks < m)).all()
    seen = set()
    for i in range(m):
        for j in range(i, m):
            members = np.where((chunks == i) | (chunks == j))[0]
            order = members[np.argsort(ids[members])]
            iu, ju = task_pairs_indices(chunks[order], i, j)
            for a, b in zip(order[iu], order[ju]):
                p = (int(ids[a]), int(ids[b]))
                assert p[0] < p[1]
                assert p not in seen, f"pair {p} emitted by two tasks"
                seen.add(p)
    assert seen == {
        (int(a), int(b)) for a in ids for b in ids if a < b
    }
    # hash chunks balance: no chunk more than ~3x the fair share (+slack
    # for small n)
    if m > 1:
        sizes = np.bincount(chunks, minlength=m)
        assert sizes.max() <= 3 * math.ceil(n / m) + 4


def test_cross_chunk_task_with_one_empty_side_emits_nothing():
    """Regression (round-4 ADVICE): a cross-chunk task (i != j) whose
    chunk-i side hashed empty must emit ZERO pairs — inferring 'single
    label present → intra task' would duplicate task (j,j)'s triangle."""
    chunks = np.array([2, 2, 2, 2], dtype=np.int64)  # only chunk 2 present
    iu, ju = task_pairs_indices(chunks, 0, 2)
    assert len(iu) == 0 and len(ju) == 0
    # the owning intra task still emits the full triangle
    iu, ju = task_pairs_indices(chunks, 2, 2)
    assert len(iu) == 4 * 3 // 2


def test_probe_regimes_find_oversized_keys():
    """_probe_oversized, all three regimes: the driver block-walk (≤
    threshold rows — zero extra tasks), the shuffle-free bounded-block
    floor regime, and the distributed scale regime (num_blocks >
    max_bucket → no safe floor) each flag exactly the over-cap keys,
    with m ≥ ceil(n/cap)."""
    import ray.data as rd

    from crawl4ai_ray.stages.bucketcap import _probe_oversized

    keys = ["hot"] * 120 + [f"k{i}" for i in range(30)]
    t = pa.table({"band_key": pa.array(keys),
                  "doc_id": pa.array(list(range(150)), type=pa.int64())})
    for nparts, cap, thresh in [
        (2, 16, 10**6),   # driver block-walk regime (exact counts)
        (2, 16, 0),       # floor≥2 regime (upper-bound counts)
        (40, 16, 0),      # scale regime (exact distributed sum)
    ]:
        sigs = rd.from_arrow(t).repartition(nparts).materialize()
        over = _probe_oversized(sigs, ["band_key"], cap,
                                driver_rows_threshold=thresh)
        assert ("hot",) in over, (nparts, cap, thresh, over)
        assert over[("hot",)] >= math.ceil(120 / cap)
        assert all(k == ("hot",) for k in over)


# --------------------------------------------------- capped == uncapped
@pytest.fixture(scope="module")
def mixed_docs():
    # 120 identical docs (hot bucket ≫ cap 16) + 30 distinct
    texts = ["the quick brown fox jumps over the lazy dog again and again"] * 120 + [
        f"unique document {i} with tokens {i * 7} {i * 13} {i * 29}" for i in range(30)
    ]
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(range(150)), type=pa.int64()), "text": pa.array(texts)}
        )
    )


@pytest.fixture(scope="module")
def mixed_vectors():
    rng = np.random.RandomState(3)
    base = rng.normal(size=8)
    vecs = [list(base + rng.normal(scale=1e-6, size=8)) for _ in range(120)] + [
        list(rng.normal(size=8)) for _ in range(30)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(150)), type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        )
    )


def test_minhash_pairs_identical_under_cap(mixed_docs):
    kw = dict(num_perm=16, band_rows=8)
    capped = {(r["id_a"], r["id_b"])
              for r in minhash_candidate_pairs(mixed_docs, max_bucket=16, **kw).take_all()}
    uncapped = {(r["id_a"], r["id_b"])
                for r in minhash_candidate_pairs(mixed_docs, max_bucket=UNCAPPED, **kw).take_all()}
    assert capped == uncapped
    assert len(capped) >= 120 * 119 // 2


def test_simhash_pairs_identical_under_cap(mixed_docs):
    capped = {(r["id_a"], r["id_b"], r["hamming"])
              for r in simhash_neardup_pairs(mixed_docs, max_bucket=16).take_all()}
    uncapped = {(r["id_a"], r["id_b"], r["hamming"])
                for r in simhash_neardup_pairs(mixed_docs, max_bucket=UNCAPPED).take_all()}
    assert capped == uncapped
    assert len(capped) >= 120 * 119 // 2


def test_embedding_lsh_pairs_identical_under_cap(mixed_vectors):
    kw = dict(dim=8, threshold=0.9, n_planes=6, seed=7)
    capped = {(r["id_a"], r["id_b"], r["cos"])
              for r in lsh_neardup_pairs(mixed_vectors, max_bucket=16, **kw).take_all()}
    uncapped = {(r["id_a"], r["id_b"], r["cos"])
                for r in lsh_neardup_pairs(mixed_vectors, max_bucket=UNCAPPED, **kw).take_all()}
    assert capped == uncapped
    assert len(capped) >= 120 * 119 // 2


def test_bucket_candidate_pairs_identical_under_cap(mixed_vectors):
    kw = dict(dim=8, n_planes=6, seed=7)
    capped = {(r["id_a"], r["id_b"])
              for r in lsh_bucket_pairs(mixed_vectors, max_bucket=16, **kw).take_all()}
    uncapped = {(r["id_a"], r["id_b"])
                for r in lsh_bucket_pairs(mixed_vectors, max_bucket=UNCAPPED, **kw).take_all()}
    assert capped == uncapped


# ------------------------------------------------ pathological 1000-dup
def test_pathological_identical_corpus_completes_bounded():
    """≥1000 byte-identical docs — every one lands in the SAME band bucket
    of every band.  With max_bucket=64 the route stage fans the bucket into
    ceil(1000/64)=16 chunks / 136 tasks per band; the full 499500-pair
    triangle still comes out exactly once."""
    n = 1000
    texts = ["boilerplate page body repeated across the entire mirror site"] * n
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(n)), type=pa.int64()), "text": pa.array(texts)})
    )
    # one band (num_perm == band_rows) → no cross-band dupes → exact count
    pairs = minhash_candidate_pairs(ds, num_perm=8, band_rows=8, max_bucket=64)
    assert pairs.count() == n * (n - 1) // 2
    sample = pairs.limit(5).take_all()
    assert all(r["id_a"] < r["id_b"] for r in sample)


def test_pathological_identical_vectors_completes_bounded():
    n = 1000
    vec = list(np.linspace(0.1, 1.0, 8))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(n)), type=pa.int64()),
                "embedding": pa.array([vec] * n, type=pa.list_(pa.float64())),
            }
        )
    )
    out = lsh_neardup_pairs(ds, dim=8, threshold=0.99, n_planes=6, seed=7, max_bucket=64)
    assert out.count() == n * (n - 1) // 2


# --------------------------------------------------- probe-regime property
def test_bounded_block_probe_never_misses_property():
    """Round-5 verdict item #10: hypothesis property over random block
    distributions — the bounded-block regime's ≥floor partial emission plus
    the driver fold's upper bound can never MISS an oversized key
    (true > max_bucket ⇒ bound > max_bucket), for any floor ≥ 2 including
    the MIN_SAFE_FLOOR fallthrough boundary.  Overestimation is allowed
    (a not-oversized key may be conservatively chunked); a miss is the
    unbounded-task blowup this module exists to prevent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawl4ai_ray.stages.bucketcap import (
        MIN_SAFE_FLOOR,
        bounded_upper_bound,
    )

    @settings(max_examples=400, deadline=None)
    @given(
        per_block=st.lists(st.integers(min_value=0, max_value=5000),
                           min_size=1, max_size=64),
        max_bucket=st.integers(min_value=1, max_value=10_000),
    )
    def check(per_block, max_bucket):
        num_blocks = len(per_block)
        floor = max_bucket // num_blocks + 1
        if floor < MIN_SAFE_FLOOR:
            # fallthrough: probe uses the exact distributed-sum regime,
            # which cannot miss by construction — nothing to bound here,
            # but exercise the boundary itself: at exactly MIN_SAFE_FLOOR
            # the bounded regime must still hold (checked below via a
            # scaled max_bucket)
            floor = MIN_SAFE_FLOOR
            max_bucket = (floor - 1) * num_blocks + num_blocks // 2
        # simulate _partials: a block emits its count iff count >= floor
        emitted = [c for c in per_block if c >= floor]
        total, seen = sum(emitted), len(emitted)
        true_count = sum(per_block)
        upper = bounded_upper_bound(total, seen, floor, num_blocks)
        # soundness of the bound itself
        assert upper >= true_count
        # the no-miss invariant
        if true_count > max_bucket:
            assert upper > max_bucket

    check()
