"""Similarity search over embedding columns (list<float>).

  * ``knn_cosine``   — brute-force top-k: the query matrix is broadcast once
    (ray.put); each map_batches task does one numpy matmul per batch and
    emits only its local top-k; the driver merges k·num_blocks candidate
    rows (never the full score matrix).
  * ``cosine_neardup_pairs`` — all-pairs cosine ≥ threshold via blocked
    matmul of each batch against the broadcast normalized matrix.  The
    scale path replaces the broadcast with LSH bucketing (random-hyperplane
    signatures → groupby bucket), implemented in ``lsh_bucket_pairs``.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values.to_numpy(zero_copy_only=False), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_cosine(ds, query_vec, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Top-k (id, cos) rows for one query vector; deterministic tie-break on
    (rounded cos desc, id asc)."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def _local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize(_matrix(batch, vec_col))
        cos = m @ qv
        ids = np.asarray(batch.column(id_col).to_numpy(zero_copy_only=False))
        order = np.lexsort((ids, -np.round(cos, 4)))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order].tolist(), type=pa.int64()),
                "cos": pa.array(np.round(cos[order], 4).tolist(), type=pa.float64()),
            }
        )

    local = ds.map_batches(
        _local_topk, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # ≤ k rows per block — tiny
    best = heapq.nsmallest(k, local, key=lambda r: (-r["cos"], r[id_col]))
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in best], type=pa.int64()),
            "cos": pa.array([r["cos"] for r in best], type=pa.float64()),
        }
    )


def cosine_neardup_pairs(
    ds,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    full_matrix: tuple | None = None,
):
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    ``full_matrix`` = (ids, normalized ndarray) is broadcast via ray.put;
    each batch matmuls against it (O(n·b·d) per batch, O(n²·d) total — the
    brute-force baseline; use lsh_bucket_pairs at scale)."""
    if full_matrix is None:
        raise ValueError("pass full_matrix=(ids, normalized_matrix)")
    ids_all, m_all = full_matrix
    ref = ray.put((np.asarray(ids_all), m_all))

    def _pairs(batch: pa.Table) -> pa.Table:
        all_ids, mat = ray.get(ref)
        m = _normalize(_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_numpy(zero_copy_only=False))
        cos = m @ mat.T  # (batch, n)
        a_out, b_out, c_out = [], [], []
        hit_rows, hit_cols = np.nonzero(cos >= threshold)
        for r, c in zip(hit_rows, hit_cols):
            a, b = ids[r], all_ids[c]
            if a < b:
                a_out.append(int(a))
                b_out.append(int(b))
                c_out.append(round(float(cos[r, c]), 4))
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "cos": pa.array(c_out, type=pa.float64()),
            }
        )

    return ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True)


class HyperplaneLSHStage:
    """Random-hyperplane signature stage (stateful: planes drawn once per
    worker from a fixed seed).  bucket = sign-bit prefix of the projection —
    vectors in the same bucket are near-duplicate candidates."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 7, vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim))
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch, self.vec_col)
        bits = (m @ self.planes.T) > 0  # (n, planes)
        keys = np.zeros(len(m), dtype=np.uint64)
        for i in range(self.planes.shape[0]):
            keys |= bits[:, i].astype(np.uint64) << np.uint64(i)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "bucket": pa.array(keys, type=pa.uint64()),
            }
        )


def lsh_neardup_pairs(
    ds,
    ids,
    normalized_matrix,
    threshold: float = 0.8,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Scale-path near-dup: LSH bucket candidates → exact cosine verify.

    Candidate pairs come from hyperplane buckets (groupby bucket — ids only
    shuffle); the verify stage looks both vectors up in the broadcast
    normalized matrix and keeps cosine ≥ threshold.  Recall < 1 by design
    (pairs split across every bucket are missed); raise recall with repeated
    bands (seed variation) like minhash banding."""
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    ref = ray.put((id_to_row, normalized_matrix))
    dim = normalized_matrix.shape[1]

    def _verify(batch: pa.Table) -> pa.Table:
        lookup, mat = ray.get(ref)
        a_ids = batch.column("id_a").to_pylist()
        b_ids = batch.column("id_b").to_pylist()
        a_out, b_out, c_out = [], [], []
        seen_pairs = set()
        for a, b in zip(a_ids, b_ids):
            if (a, b) in seen_pairs:
                continue
            seen_pairs.add((a, b))
            cos = float(mat[lookup[a]] @ mat[lookup[b]])
            if cos >= threshold:
                a_out.append(a)
                b_out.append(b)
                c_out.append(round(cos, 4))
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "cos": pa.array(c_out, type=pa.float64()),
            }
        )

    pairs = lsh_bucket_pairs(ds, dim, n_planes, seed, id_col, vec_col)
    verified = pairs.map_batches(_verify, batch_format="pyarrow", zero_copy_batch=True)

    def _dedup(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return verified.groupby(["id_a", "id_b"]).map_groups(_dedup, batch_format="pyarrow")


def lsh_bucket_pairs(ds, dim: int, n_planes: int = 12, seed: int = 7,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Scale path: bucket by hyperplane signature, emit candidate pairs per
    bucket (groupby bucket — the only shuffle; bucket payload is ids only)."""

    def _pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column(id_col).to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a, type=pa.int64()), "id_b": pa.array(b, type=pa.int64())})

    sigs = ds.map_batches(
        HyperplaneLSHStage,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, seed=seed, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
        zero_copy_batch=True,
    )
    return sigs.groupby("bucket").map_groups(_pairs, batch_format="pyarrow")
