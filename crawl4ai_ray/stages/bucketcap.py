"""Bounded-group pair generation for LSH band buckets (skew protection).

The classic 100-TB failure mode of LSH dedup (minhash / simhash /
hyperplane buckets) is a SKEWED BAND KEY: boilerplate-heavy web corpora put
thousands of near-identical documents into one band bucket, and a naive
``groupby(band).map_groups(all_pairs)`` turns that bucket into a single
straggler task materializing O(n²) pairs (with the verify payload — shingle
sets or embedding vectors — riding along).  The reference engine never hits
this because it has no corpus-level LSH at all (SURVEY.md §2.9); this module
is the scale-side answer.

``capped_group_pairs`` is an EXACT decomposition, not a lossy cap:

  1. the banded table materializes once and a tiny ids-only
     ``groupby(band).count()`` finds the oversized keys — by definition of
     skew there are few, so the driver holds only those;
  2. **no oversized keys (the overwhelmingly common case): the pipeline is
     byte-identical to the naive shape** — one groupby, pairs emitted
     directly in the group task, no extra shuffle;
  3. otherwise a vectorized routing map re-keys rows: an oversized bucket's
     rows hash-chunk into m = ceil(n / max_bucket) chunks, and every
     unordered chunk pair (i ≤ j) becomes its own group task (task key =
     literal band key + chunk ids — collision-free).  Task (i,j) emits the
     position-ordered pairs filtered to cross-chunk (or all pairs when
     i == j), so the union over tasks is exactly the triangle of the bucket
     with each pair in exactly one task.  Normal buckets ride the same
     groupby under their literal band key with chunk = -1.

The output pair set is therefore IDENTICAL to uncapped all-pairs semantics
(the DuckDB oracles for minhash/simhash/embedding LSH stay green even when
the cap triggers), while no group task holds more than ~2·max_bucket rows
(hash chunks balance to n/m each w.h.p.) or emits more than ~max_bucket²
pairs.  A row in an oversized bucket replicates to m tasks (its verify
payload — 8 B/shingle-hash, 8 B simhash, or the embedding vector — ships m
times); the O(n²) pair OUTPUT is inherent to the operator's contract — what
this bounds is per-task memory and the straggler, spreading the quadratic
work across ~m²/2 parallel tasks.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TKEY = "_bc_tkey"
CHUNK = "_bc_chunk"

DEFAULT_MAX_BUCKET = 512


def mix64(ids: np.ndarray) -> np.ndarray:
    """Fibonacci-style id mixing (vectorized) so sequential ids spread
    uniformly; chunk of a row in an m-way split = mix64(id) % m."""
    with np.errstate(over="ignore"):
        x = ids.astype(np.uint64, copy=False) * np.uint64(0x9E3779B97F4A7C15)
    return x ^ (x >> np.uint64(29))


def chunk_of(ids: np.ndarray, m: int) -> np.ndarray:
    """Hash-chunk assignment for an oversized bucket's rows (splittable
    without knowing ranks): chunk = mix64(id) % m."""
    return (mix64(ids) % np.uint64(m)).astype(np.int64)


def task_pairs_indices(chunks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs a task emits over its position-ordered rows: all (p < q)
    when the task holds one chunk (intra / normal bucket), cross-chunk
    (p < q, chunk[p] != chunk[q]) when it holds two — together the exact
    triangle of the original bucket, each pair in exactly one task."""
    n = len(chunks)
    iu, ju = np.triu_indices(n, k=1)
    if n and chunks.min() != chunks.max():
        keep = chunks[iu] != chunks[ju]
        return iu[keep], ju[keep]
    return iu, ju


def capped_group_pairs(
    ds,
    group_cols: list[str],
    id_col: str,
    payload_cols: list[str],
    verify_fn,
    pair_schema: pa.Schema,
    max_bucket: int = DEFAULT_MAX_BUCKET,
):
    """groupby(group_cols) → all-pairs-per-group with bounded task sizes.

    ``ds`` must carry ``group_cols + [id_col] + payload_cols``.
    ``verify_fn(sorted_group: pa.Table, iu: np.ndarray, ju: np.ndarray) ->
    pa.Table`` receives the group's rows sorted ascending by ``id_col``
    (columns: id_col + payload_cols) and the candidate index pairs, and
    returns a table with exactly ``pair_schema`` (it applies the family's
    verify — hamming / cosine threshold — or just projects ids).

    Exactness: output pair multiset over distinct (group, a<b) is identical
    to the naive unbounded ``map_groups(all_pairs)``; a pair that lands in
    several groups (multi-band LSH) still needs the caller's downstream
    pair-dedup, same as before.
    """
    import ray

    payload = [id_col] + payload_cols

    def _sorted(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        return group.take(idx)

    def _direct(group: pa.Table) -> pa.Table:
        g = _sorted(group).select(payload)
        iu, ju = np.triu_indices(g.num_rows, k=1)
        return verify_fn(g, iu, ju)

    # the banded table is consumed twice (size scan + pair generation);
    # materialize so the signature stage runs once.  Rows are ids + band
    # keys (+ the small verify payload) — object-store friendly, spills.
    sigs = ds.materialize()

    # oversize scan as groupby().map_groups rather than .count(): the
    # aggregate's hash-shuffle aggregator pool pays a multi-second actor
    # spin-up per call (measured 4.3 s vs 1.6 s at sf0.1 for the identical
    # key cardinality); the task-based sort shuffle has no pool to warm.
    # Only keys over the cap leave the cluster — tiny by definition of skew.
    def _size_row(group: pa.Table) -> pa.Table:
        keep = 1 if group.num_rows > max_bucket else 0
        return group.slice(0, keep).select(group_cols).append_column(
            "_n", pa.array([group.num_rows] * keep, type=pa.int64())
        )

    big = (
        sigs.select_columns(group_cols)
        .groupby(group_cols)
        .map_groups(_size_row, batch_format="pyarrow")
        .take_all()
    )

    if not big:
        # fast path: identical to the uncapped pipeline shape
        return sigs.groupby(group_cols).map_groups(_direct, batch_format="pyarrow")

    oversized = {
        tuple(r[c] for c in group_cols): math.ceil(r["_n"] / max_bucket)
        for r in big
    }
    over_ref = ray.put(oversized)

    def _route(batch: pa.Table) -> pa.Table:
        over = ray.get(over_ref)
        key_cols = [batch.column(c).to_pylist() for c in group_cols]
        ids = np.asarray(batch.column(id_col).to_numpy(zero_copy_only=False))
        mixed = mix64(ids)
        n = batch.num_rows
        take_idx: list[int] = []
        tkeys: list[str] = []
        chunks: list[int] = []
        for r in range(n):
            key = tuple(col[r] for col in key_cols)
            lit = "|".join(str(v) for v in key)
            m = over.get(key)
            if m is None:
                take_idx.append(r)
                tkeys.append(f"b|{lit}")
                chunks.append(-1)
                continue
            # NB: python-int FIRST — numpy uint64 % python int promotes to
            # float64 and quantizes large hashes (chunks collapse to 0)
            c = int(mixed[r]) % m
            for o in range(m):
                i, j = (c, o) if c <= o else (o, c)
                take_idx.append(r)
                tkeys.append(f"s|{lit}|{i}|{j}")
                chunks.append(c)
        out = batch.select(payload).take(pa.array(take_idx, type=pa.int64()))
        return out.append_column(TKEY, pa.array(tkeys, type=pa.string())).append_column(
            CHUNK, pa.array(chunks, type=pa.int32())
        )

    def _task(group: pa.Table) -> pa.Table:
        g = _sorted(group)
        chunks = np.asarray(g.column(CHUNK).to_numpy(zero_copy_only=False))
        iu, ju = task_pairs_indices(chunks)
        return verify_fn(g.select(payload), iu, ju)

    routed = sigs.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
    return routed.groupby(TKEY).map_groups(_task, batch_format="pyarrow")
