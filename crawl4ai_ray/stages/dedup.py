"""Corpus-level deduplication operators (training-data pipeline extensions).

The reference has only per-page/per-crawl exact dedup (SURVEY.md §2.9 — no
minhash/simhash corpus dedup exists there); these operators add the standard
large-scale variants, each expressed Ray-Data-first:

  * exact dedup        — 64-bit content hash → groupby(hash) → min(id).
    The hash shrinks shuffle payload: the full text never shuffles.
  * minhash + LSH      — map_batches signature (stateful MinHasher per
    worker) → flat_map band keys → groupby(band) emits candidate pairs →
    exact jaccard verify inside map_groups.  Only signatures + doc ids
    shuffle; texts for the verify step come from a broadcast (ray.put) dict
    at test scale / a hash-join at production scale.
  * simhash            — signature column + bucket-by-prefix near-dup pairs.
  * embedding cosine   — see stages/similarity.py (shared matmul kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.textstats import MinHasher, jaccard, shingles, simhash64
from ..hashing import h64


# ------------------------------------------------------------------ exact
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep min(id) per identical text → Dataset[{id_col}].

    Pattern: hash inside map_batches (combiner: only (hash, id) shuffles),
    then groupby(hash).map_groups(min).
    """

    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col)
        return pa.table(
            {
                id_col: ids,
                "text_hash": pa.array(
                    np.fromiter((h64(t or "") for t in texts), dtype=np.uint64, count=len(texts)),
                    type=pa.uint64(),
                ),
            }
        )

    def _first(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({id_col: [pc.min(group.column(id_col)).as_py()]})

    return (
        ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .map_groups(_first, batch_format="pyarrow")
    )


# ----------------------------------------------------------------- minhash
class MinHashSignatureStage:
    """Stateful map_batches stage: text → minhash signature + band keys.
    MinHasher built once per worker (__init__), applied per batch."""

    def __init__(self, num_perm: int = 64, band_rows: int = 8, shingle_k: int = 3, seed: int = 1):
        self.hasher = MinHasher(num_perm, seed)
        self.band_rows = band_rows
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_id, out_band_idx, out_band_key = [], [], []
        for i, t in zip(ids, texts):
            sig = self.hasher.signature(shingles(t or "", self.shingle_k))
            for b_idx, key in enumerate(self.hasher.bands(sig, self.band_rows)):
                out_id.append(i)
                out_band_idx.append(b_idx)
                out_band_key.append(key)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band_idx": pa.array(out_band_idx, type=pa.int32()),
                "band_key": pa.array(out_band_key, type=pa.uint64()),
            }
        )


def minhash_candidate_pairs(ds, num_perm=64, band_rows=8, shingle_k=3, seed=1):
    """documents(text, doc_id) → candidate near-dup pairs (id_a < id_b) via
    LSH banding.  groupby((band_idx, band_key)) is the one shuffle; bucket
    sizes are tiny unless the corpus is pathological."""

    def _pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        a_col, b_col = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_col.append(ids[i])
                b_col.append(ids[j])
        return pa.table(
            {"id_a": pa.array(a_col, type=pa.int64()), "id_b": pa.array(b_col, type=pa.int64())}
        )

    sigs = ds.map_batches(
        MinHashSignatureStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, band_rows=band_rows, shingle_k=shingle_k, seed=seed
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
        zero_copy_batch=True,
    )
    pairs = sigs.groupby(["band_idx", "band_key"]).map_groups(
        _pairs, batch_format="pyarrow"
    )
    return pairs


def minhash_dedup_pairs(
    ds,
    threshold: float = 0.5,
    num_perm: int = 64,
    band_rows: int = 8,
    shingle_k: int = 3,
    seed: int = 1,
    texts_lookup: dict | None = None,
):
    """Candidate pairs verified by exact n-gram jaccard ≥ threshold.

    ``texts_lookup`` (doc_id → text) is broadcast via ray.put once and read
    inside every verify task — the classic small-side broadcast; for corpora
    where texts don't fit, replace with a hash-join of pairs against the
    documents table on both sides.
    """
    pairs = minhash_candidate_pairs(ds, num_perm, band_rows, shingle_k, seed)
    if texts_lookup is None:
        raise ValueError("texts_lookup required (broadcast verify path)")
    lookup_ref = ray.put(texts_lookup)
    k = shingle_k

    def _verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        seen_pairs = set()
        a_out, b_out, j_out = [], [], []
        for a, b in zip(batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()):
            if (a, b) in seen_pairs:
                continue
            seen_pairs.add((a, b))
            jac = jaccard(shingles(lookup.get(a, ""), k), shingles(lookup.get(b, ""), k))
            if jac >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(jac, 4))
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "jaccard": pa.array(j_out, type=pa.float64()),
            }
        )

    verified = pairs.map_batches(_verify, batch_format="pyarrow", zero_copy_batch=True)

    # distinct pairs (a pair can surface from several bands): final dedup
    def _dedup_group(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return verified.groupby(["id_a", "id_b"]).map_groups(
        _dedup_group, batch_format="pyarrow"
    )


# ----------------------------------------------------------------- simhash
def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        # hex strings rather than uint64 — survives every downstream
        # conversion (pandas/duckdb/json) without signedness trouble
        return pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array(
                    [f"{simhash64(t or ''):016x}" for t in texts], type=pa.string()
                ),
            }
        )

    return ds.map_batches(_sig, batch_format="pyarrow", zero_copy_batch=True)
