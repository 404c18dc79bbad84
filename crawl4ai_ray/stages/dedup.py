"""Corpus-level deduplication operators (training-data pipeline extensions).

The reference has only per-page/per-crawl exact dedup (SURVEY.md §2.9 — no
minhash/simhash corpus dedup exists there); these operators add the standard
large-scale variants, each expressed Ray-Data-first:

  * exact dedup        — 64-bit content hash → groupby(hash) → min(id).
    The hash shrinks shuffle payload: the full text never shuffles.
  * minhash + LSH      — map_batches signature (stateful MinHasher per
    worker) → band keys → groupby(band) emits candidate pairs → exact
    jaccard verify over per-doc shingle-hash sets (8 bytes/shingle, never
    the text): semi-join pushdown + O(pairs) broadcast when candidates are
    few, distributed hash joins above a threshold.  The corpus never
    broadcasts and never materializes on the driver in either regime.
  * simhash            — signature column + bucket-by-prefix near-dup pairs.
  * embedding cosine   — see stages/similarity.py (shared matmul kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.textstats import MinHasher, shingle_hashes, shingles, simhash64
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
                "band_key": pa.array(out_band_key, type=pa.string()),
            }
        )


class ShingleHashStage:
    """Stateless-but-compiled map_batches stage: text → distinct shingle md5
    hashes, serialized to one binary cell per doc (uint64 little-endian) so
    the pair⋈shingles hash join ships 8 bytes/shingle instead of the text
    (and Arrow's acero join, which rejects list payloads, accepts it)."""

    def __init__(self, shingle_k: int = 3, id_col: str = "doc_id", text_col: str = "text"):
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "sh": pa.array(
                    [shingle_hashes(t or "", self.shingle_k).tobytes() for t in texts],
                    type=pa.binary(),
                ),
            }
        )


_PAIR_IDS_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _ids_verify(g: pa.Table, iu: np.ndarray, ju: np.ndarray) -> pa.Table:
    """Projection-only verify for candidate generators: emit (id_a, id_b)
    for the given index pairs (g is sorted ascending by doc id)."""
    ids = np.asarray(g.column(g.schema.names[0]).to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "id_a": pa.array(ids[iu], type=pa.int64()),
            "id_b": pa.array(ids[ju], type=pa.int64()),
        }
    )


def minhash_candidate_pairs(
    ds, num_perm=64, band_rows=8, shingle_k=3, seed=1,
    max_bucket: int | None = None,
):
    """documents(text, doc_id) → candidate near-dup pairs (id_a < id_b) via
    LSH banding.  groupby((band_idx, band_key)) is the one big shuffle.

    Skewed band keys (boilerplate-heavy corpora put thousands of
    near-identical docs in one bucket) are handled by
    stages/bucketcap.py::capped_group_pairs: buckets over ``max_bucket``
    rows are EXACTLY decomposed into bounded chunk-pair tasks, so the pair
    set is unchanged but no single group task is quadratic in the bucket."""
    from .bucketcap import DEFAULT_MAX_BUCKET, capped_group_pairs

    sigs = ds.map_batches(
        MinHashSignatureStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, band_rows=band_rows, shingle_k=shingle_k, seed=seed
        ),
        batch_format="pyarrow",
        concurrency=(1, 16),
        zero_copy_batch=True,
    )
    return capped_group_pairs(
        sigs,
        group_cols=["band_idx", "band_key"],
        id_col="doc_id",
        payload_cols=[],
        verify_fn=_ids_verify,
        pair_schema=_PAIR_IDS_SCHEMA,
        max_bucket=max_bucket or DEFAULT_MAX_BUCKET,
    )


def minhash_dedup_pairs(
    ds,
    threshold: float = 0.5,
    num_perm: int = 64,
    band_rows: int = 8,
    shingle_k: int = 3,
    seed: int = 1,
    num_partitions: int | None = None,
    broadcast_pairs_threshold: int = 200_000,
    max_bucket: int | None = None,
):
    """Candidate pairs verified by exact n-gram jaccard ≥ threshold — the
    100-TB shape: NO broadcast, NO driver materialization.

      pairs   = band groupby (ids only shuffle)
      dedup   = groupby(id_a, id_b) first-row (a pair surfaces per band)
      verify  = pairs ⋈ shingle_sets on id_a, then on id_b (hash join;
                payload = packed uint64 shingle hashes, 8 B/shingle), then a
                vectorized jaccard inside map_batches.

    The CANDIDATE PAIRS materialize (ids only — tiny: near-dup candidates ≪
    corpus) to break the deep DAG: with the minhash groupby, two join
    aggregator pools and the actor stages all reserving resources in one
    streaming DAG, small clusters deadlock.  The corpus-sized side (shingle
    sets) never materializes in either regime.

    Verify is SIZE-ADAPTIVE on the (now known) pair count:
      * ≤ ``broadcast_pairs_threshold``: semi-join pushdown — the candidate
        ID set (ints only) filters the documents scan, shingle hashes are
        computed for candidate docs ONLY, and that provably-small lookup
        (O(pairs), never O(corpus)) broadcasts via ray.put into a single
        verify map.  Joins at this size pay two aggregator-pool spin-ups
        for nothing (measured 15 s for 255 pairs at sf0.1).
      * above it: two distributed hash joins (pairs ⋈ shingles on id_a,
        id_b) — nothing driver-held, the 100-TB regime.

    Jaccard over distinct md5-shingle-hash sets; results round with DuckDB
    semantics so the SQL oracle (pipelines/queries.py
    ORACLE_SQL['minhash_neardup_pairs']) hash-matches exactly.
    """
    import ray

    from ..functions.numeric import duck_round

    if num_partitions is None:
        # both joins' aggregator pools coexist in the streaming DAG; size
        # them to the cluster so they schedule alongside the map/groupby
        # stages (at 1.0 CPU each, 2×partitions aggregators deadlock small
        # clusters — hence the fractional num_cpus below)
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(cpus // 2, 64))
    agg_args = {"num_cpus": 0.25}

    pairs = minhash_candidate_pairs(
        ds, num_perm, band_rows, shingle_k, seed, max_bucket=max_bucket
    )

    def _dedup_group(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    pairs = pairs.groupby(["id_a", "id_b"]).map_groups(
        _dedup_group, batch_format="pyarrow"
    ).materialize()

    def _verify_from(batch: pa.Table, sh_a_col, sh_b_col) -> pa.Table:
        a_out, b_out, j_out = [], [], []
        for a, b, sa, sb in zip(
            batch.column("id_a").to_pylist(),
            batch.column("id_b").to_pylist(),
            sh_a_col,
            sh_b_col,
        ):
            ha = np.frombuffer(sa, dtype=np.uint64)
            hb = np.frombuffer(sb, dtype=np.uint64)
            if len(ha) == 0 and len(hb) == 0:
                jac = 1.0
            else:
                inter = len(np.intersect1d(ha, hb, assume_unique=True))
                union = len(ha) + len(hb) - inter
                jac = inter / union if union else 0.0
            if jac >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(float(duck_round(jac, 4)))
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "jaccard": pa.array(j_out, type=pa.float64()),
            }
        )

    n_pairs = pairs.count()
    if n_pairs == 0:
        return pairs.map_batches(
            lambda b: pa.table(
                {"id_a": pa.array([], type=pa.int64()),
                 "id_b": pa.array([], type=pa.int64()),
                 "jaccard": pa.array([], type=pa.float64())}
            ),
            batch_format="pyarrow",
        )

    if n_pairs <= broadcast_pairs_threshold:
        # semi-join pushdown: filter the documents SCAN by candidate ids,
        # hash shingles for those docs only, broadcast the O(pairs) lookup
        import pyarrow.compute as pc

        pair_rows = pairs.take_all()  # ids only, ≤ threshold rows
        cand_ids = pa.array(
            sorted({r["id_a"] for r in pair_rows} | {r["id_b"] for r in pair_rows})
        )

        def _only_candidates(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b.column("doc_id"), value_set=cand_ids))

        sh_rows = (
            ds.map_batches(_only_candidates, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                ShingleHashStage,
                fn_constructor_kwargs=dict(shingle_k=shingle_k),
                batch_format="pyarrow",
                concurrency=(1, 16),
                zero_copy_batch=True,
            )
            .take_all()
        )
        lookup_ref = ray.put({r["doc_id"]: r["sh"] for r in sh_rows})

        def _verify_broadcast(batch: pa.Table) -> pa.Table:
            lookup = ray.get(lookup_ref)
            return _verify_from(
                batch,
                [lookup.get(a, b"") for a in batch.column("id_a").to_pylist()],
                [lookup.get(b, b"") for b in batch.column("id_b").to_pylist()],
            )

        return pairs.map_batches(
            _verify_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )

    shingle_ds = ds.map_batches(
        ShingleHashStage,
        fn_constructor_kwargs=dict(shingle_k=shingle_k),
        batch_format="pyarrow",
        concurrency=(1, 16),
        zero_copy_batch=True,
    )

    joined = pairs.join(
        shingle_ds, "inner", num_partitions=num_partitions,
        on=("id_a",), right_on=("doc_id",),
        aggregator_ray_remote_args=agg_args,
    ).rename_columns({"sh": "sh_a"}).join(
        shingle_ds, "inner", num_partitions=num_partitions,
        on=("id_b",), right_on=("doc_id",),
        aggregator_ray_remote_args=agg_args,
    ).rename_columns({"sh": "sh_b"})

    def _verify(batch: pa.Table) -> pa.Table:
        return _verify_from(
            batch, batch.column("sh_a").to_pylist(), batch.column("sh_b").to_pylist()
        )

    return joined.map_batches(_verify, batch_format="pyarrow", zero_copy_batch=True)


def jaccard_neardup_exact(ds, threshold: float = 0.5, shingle_k: int = 3):
    """EXACT all-pairs n-gram jaccard ≥ threshold — the brute-force baseline
    the LSH pipeline (minhash_dedup_pairs) approximates, mirroring
    cosine_neardup_pairs' role for embeddings: the packed shingle table
    broadcasts once (ray.put — O(corpus·8B/shingle), fine at benchmark
    scale, NOT the 100-TB path) and each batch compares its docs against
    every later doc.  SQL-oracled; duck_round(4) on the emitted jaccard."""
    import ray

    from ..functions.numeric import duck_round

    sh_rows = (
        ds.map_batches(
            ShingleHashStage,
            fn_constructor_kwargs=dict(shingle_k=shingle_k),
            batch_format="pyarrow",
            concurrency=(1, 16),
            zero_copy_batch=True,
        ).take_all()
    )
    all_ids = np.asarray([r["doc_id"] for r in sh_rows], dtype=np.int64)
    all_sets = [np.frombuffer(r["sh"], dtype=np.uint64) for r in sh_rows]
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    all_sets = [all_sets[i] for i in order]
    ref = ray.put((all_ids, all_sets))

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_all, sets_all = ray.get(ref)
        pos = {int(i): p for p, i in enumerate(ids_all)}
        a_out, b_out, j_out = [], [], []
        for did, sh in zip(
            batch.column("doc_id").to_pylist(), batch.column("sh").to_pylist()
        ):
            ha = np.frombuffer(sh, dtype=np.uint64)
            p = pos[did]
            for q in range(p + 1, len(ids_all)):
                hb = sets_all[q]
                if len(ha) == 0 and len(hb) == 0:
                    jac = 1.0
                else:
                    inter = len(np.intersect1d(ha, hb, assume_unique=True))
                    union = len(ha) + len(hb) - inter
                    jac = inter / union if union else 0.0
                if jac >= threshold:
                    a_out.append(did)
                    b_out.append(int(ids_all[q]))
                    j_out.append(float(duck_round(jac, 4)))
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "jaccard": pa.array(j_out, type=pa.float64()),
            }
        )

    sh_ds = ds.map_batches(
        ShingleHashStage,
        fn_constructor_kwargs=dict(shingle_k=shingle_k),
        batch_format="pyarrow",
        concurrency=(1, 16),
        zero_copy_batch=True,
    )
    return sh_ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------------- simhash
class SimHashBandStage:
    """Stateful map_batches stage: text → one row per 16-bit simhash band
    (doc_id, band_idx, band_val, sim).  With 64-bit signatures and 4 bands,
    any pair within hamming distance 3 shares at least one identical band
    (pigeonhole), so the band groupby is a recall-1 candidate generator for
    near-dups at that radius."""

    def __init__(self, n_bands: int = 4, text_col: str = "text", id_col: str = "doc_id"):
        assert 64 % n_bands == 0
        self.n_bands = n_bands
        self.bits = 64 // n_bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        mask = (1 << self.bits) - 1
        out_id, out_bidx, out_bval, out_sim = [], [], [], []
        for i, t in zip(ids, texts):
            s = simhash64(t or "")
            for b in range(self.n_bands):
                out_id.append(i)
                out_bidx.append(b)
                out_bval.append((s >> (b * self.bits)) & mask)
                out_sim.append(s)
        return pa.table(
            {
                self.id_col: pa.array(out_id, type=pa.int64()),
                "band_idx": pa.array(out_bidx, type=pa.int32()),
                "band_val": pa.array(out_bval, type=pa.int64()),
                "sim": pa.array(out_sim, type=pa.uint64()),
            }
        )


def simhash_neardup_pairs(ds, max_hamming: int = 3, n_bands: int = 4,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_bucket: int | None = None):
    """SimHash near-dup pairs: band groupby → in-group pairwise hamming ≤
    ``max_hamming`` (signatures ride the shuffle — 8 B/row — so the verify
    needs no lookup side at all) → pair dedup (a pair can match in several
    bands).  Fully SQL-oracled (ORACLE_SQL['simhash_neardup_pairs']).

    Skewed band values are bounded by bucketcap.capped_group_pairs (exact
    chunk-pair decomposition, pair set unchanged — see that module)."""
    from .bucketcap import DEFAULT_MAX_BUCKET, capped_group_pairs

    def _hamming_verify(g: pa.Table, iu: np.ndarray, ju: np.ndarray) -> pa.Table:
        ids = np.asarray(g.column(id_col).to_numpy(zero_copy_only=False))
        sims = np.asarray(g.column("sim").to_numpy(zero_copy_only=False), dtype=np.uint64)
        if len(iu):
            x = sims[iu] ^ sims[ju]
            h = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
            keep = h <= max_hamming
        else:
            h = np.empty(0, dtype=np.int64)
            keep = np.zeros(0, dtype=bool)
        return pa.table(
            {
                "id_a": pa.array(ids[iu][keep], type=pa.int64()),
                "id_b": pa.array(ids[ju][keep], type=pa.int64()),
                "hamming": pa.array(h[keep].astype(np.int32), type=pa.int32()),
            }
        )

    def _dedup_group(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    bands = ds.map_batches(
        SimHashBandStage,
        fn_constructor_kwargs=dict(n_bands=n_bands, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=(1, 16),
        zero_copy_batch=True,
    )
    pairs = capped_group_pairs(
        bands,
        group_cols=["band_idx", "band_val"],
        id_col=id_col,
        payload_cols=["sim"],
        verify_fn=_hamming_verify,
        pair_schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("hamming", pa.int32())]
        ),
        max_bucket=max_bucket or DEFAULT_MAX_BUCKET,
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        _dedup_group, batch_format="pyarrow"
    )


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
