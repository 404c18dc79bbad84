"""Deterministic sampling / split assignment (stages/sampling.py).

The operators' contract is id-stable membership: a row's sample/split fate
depends only on (id, salt), never on the rest of the corpus, the block
layout, or an RNG — that's what makes them safe to re-run over a growing
corpus.  Tests pin determinism, nesting (smaller rate ⊆ larger rate),
subset invariance, split disjointness/coverage and the exact bucket
boundary semantics the SQL oracle mirrors."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from crawl4ai_ray.hashing import md5_64
from crawl4ai_ray.stages.sampling import (
    BUCKETS,
    _bucket_array,
    hash_sample,
    stratified_split,
)


def _docs(ids):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(list(ids), type=pa.int64())})
    )


def test_bucket_array_matches_md5_64():
    ids = [0, 1, 7, 123456789]
    b = _bucket_array(ids, "sample:v1")
    assert b.tolist() == [md5_64(f"sample:v1|{v}") % BUCKETS for v in ids]


def test_hash_sample_deterministic_and_nested(ray_session):
    ids = range(2000)
    kept10 = {r["doc_id"] for r in hash_sample(_docs(ids), 0.1).take_all()}
    kept10b = {r["doc_id"] for r in hash_sample(_docs(ids), 0.1).take_all()}
    kept05 = {r["doc_id"] for r in hash_sample(_docs(ids), 0.05).take_all()}
    assert kept10 == kept10b
    assert kept05 <= kept10  # bucket < cut nests by construction
    # rate lands near target (md5 buckets are uniform)
    assert 0.07 < len(kept10) / 2000 < 0.13


def test_hash_sample_subset_invariance(ray_session):
    # removing other rows never changes a surviving row's membership
    ids = list(range(1000))
    full = {r["doc_id"] for r in hash_sample(_docs(ids), 0.2).take_all()}
    half = {r["doc_id"] for r in hash_sample(_docs(ids[::2]), 0.2).take_all()}
    assert half == {i for i in full if i % 2 == 0}


def test_stratified_split_disjoint_covering_and_exact(ray_session):
    ids = list(range(3000))
    rows = stratified_split(_docs(ids)).take_all()
    assert len(rows) == 3000
    by_label: dict[str, set] = {}
    for r in rows:
        by_label.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_label) <= {"train", "val", "test"}
    assert sum(len(v) for v in by_label.values()) == 3000
    # exact boundary semantics (the oracle's CASE ranges)
    for r in rows:
        b = md5_64(f"split:v1|{r['doc_id']}") % BUCKETS
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert r["split"] == want, (r, b)


def test_stratified_split_custom_weights(ray_session):
    rows = stratified_split(
        _docs(range(500)), splits=[("a", 1), ("b", 1)], salt="s2"
    ).take_all()
    labels = {r["split"] for r in rows}
    assert labels == {"a", "b"}
    for r in rows:
        b = md5_64(f"s2|{r['doc_id']}") % BUCKETS
        assert r["split"] == ("a" if b < BUCKETS // 2 else "b")


def test_hash_split_sides_are_exact_complements(ray_session):
    from crawl4ai_ray.stages.sampling import hash_split

    ids = list(range(1500))
    keep = {r["doc_id"] for r in hash_split(_docs(ids), 0.2, keep=True).take_all()}
    rest = {r["doc_id"] for r in hash_split(_docs(ids), 0.2, keep=False).take_all()}
    assert keep | rest == set(ids)
    assert keep & rest == set()
