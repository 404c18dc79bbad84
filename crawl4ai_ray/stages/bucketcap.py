"""Bounded-group pair generation for LSH band buckets (skew protection).

The classic 100-TB failure mode of LSH dedup (minhash / simhash /
hyperplane buckets) is a SKEWED BAND KEY: boilerplate-heavy web corpora put
thousands of near-identical documents into one band bucket, and a naive
``groupby(band).map_groups(all_pairs)`` turns that bucket into a single
straggler task materializing O(n²) pairs (with the verify payload — shingle
sets or embedding vectors — riding along).  The reference engine never hits
this because it has no corpus-level LSH at all (SURVEY.md §2.9); this module
is the scale-side answer.

``capped_group_pairs`` is an EXACT decomposition, not a lossy cap: an
oversized bucket of n rows is split (in ascending id order) into
m = ceil(n / max_bucket) chunks, and every unordered chunk pair (i ≤ j)
becomes its own downstream group task keyed by a collision-free string key
``"<band key>|i|j"``.  Task (i,i) emits the intra-chunk pairs, task (i,j)
the cross-chunk pairs — together exactly the triangle {(a,b): a < b} of the
original bucket, each pair in exactly one task.  The output pair set is
therefore IDENTICAL to the uncapped all-pairs semantics (the DuckDB oracles
for minhash/simhash/embedding LSH stay green even when the cap triggers),
while no group task ever holds more than 2·max_bucket rows or emits more
than max_bucket² pairs.

Cost model: a row in an oversized bucket is replicated to m tasks (its
verify payload — 8 B/shingle-hash, 8 B simhash, or the embedding vector —
ships m times).  The O(n²) pair OUTPUT is inherent to the operator's
contract; what this bounds is per-task memory and the straggler, spreading
the quadratic work across ~m²/2 parallel tasks.  Buckets at or under
``max_bucket`` (the overwhelmingly common case) take the direct path: pairs
are emitted inside the band group task itself and only the routed table's
materialize barrier is added — no second shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TKEY = "_bc_tkey"
CHUNK = "_bc_chunk"

DEFAULT_MAX_BUCKET = 512


def triangle_tasks(n: int, max_bucket: int):
    """Pure helper (unit-tested): for a bucket of ``n`` rows, yield
    (row_index, chunk_i, chunk_j) memberships such that the union of
    per-task pair sets is exactly {(a, b): 0 <= a < b < n} with each pair in
    exactly one task.  Row r (chunk c = r // max_bucket) joins every task
    (min(c, o), max(c, o)) for o in range(m)."""
    m = math.ceil(n / max_bucket)
    for r in range(n):
        c = r // max_bucket
        for o in range(m):
            yield r, min(c, o), max(c, o)


def _cross_indices(split: int, n: int):
    """Index pairs (a from [0, split), b from [split, n)) — the cross pairs
    of a two-chunk task."""
    iu = np.repeat(np.arange(split), n - split)
    ju = np.tile(np.arange(split, n), split)
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
    pair_names = [f.name for f in pair_schema]

    def _route(group: pa.Table) -> pa.Table:
        n = group.num_rows
        sort_idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        g = group.take(sort_idx)
        payload = g.select([id_col] + payload_cols)
        payload_fields = list(payload.schema)
        if n <= max_bucket:
            iu, ju = np.triu_indices(n, k=1)
            pairs = verify_fn(payload, iu, ju)
            k = pairs.num_rows
            cols = {name: pairs.column(name) for name in pair_names}
            cols[TKEY] = pa.nulls(k, pa.string())
            cols[CHUNK] = pa.nulls(k, pa.int32())
            for f in payload_fields:
                cols[f.name] = pa.nulls(k, f.type)
            return pa.table(cols)
        # oversized bucket: replicate rows to triangle tasks; the task key
        # embeds the literal band key values, so it is collision-free by
        # construction (no hash involved)
        key_prefix = "|".join(str(g.column(c)[0].as_py()) for c in group_cols)
        idx_out, tkey_out, chunk_out = [], [], []
        for r, i, j in triangle_tasks(n, max_bucket):
            idx_out.append(r)
            tkey_out.append(f"{key_prefix}|{i}|{j}")
            chunk_out.append(r // max_bucket)
        memb = payload.take(pa.array(idx_out, type=pa.int64()))
        cols = {
            name: pa.nulls(len(idx_out), pair_schema.field(name).type)
            for name in pair_names
        }
        cols[TKEY] = pa.array(tkey_out, type=pa.string())
        cols[CHUNK] = pa.array(chunk_out, type=pa.int32())
        for f in payload_fields:
            cols[f.name] = memb.column(f.name)
        return pa.table(cols)

    def _task_pairs(group: pa.Table) -> pa.Table:
        sort_idx = pc.sort_indices(
            group, sort_keys=[(CHUNK, "ascending"), (id_col, "ascending")]
        )
        g = group.take(sort_idx)
        chunks = g.column(CHUNK).to_numpy(zero_copy_only=False)
        n = g.num_rows
        if n and chunks[0] != chunks[-1]:
            split = int(np.searchsorted(chunks, chunks[0], side="right"))
            iu, ju = _cross_indices(split, n)
        else:
            iu, ju = np.triu_indices(n, k=1)
        return verify_fn(g.select([id_col] + payload_cols), iu, ju)

    routed = ds.groupby(group_cols).map_groups(
        _route, batch_format="pyarrow"
    ).materialize()

    def _only_pairs(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b.column(TKEY))).select(pair_names)

    def _only_memb(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b.column(TKEY))).select(
            [TKEY, CHUNK, id_col] + payload_cols
        )

    direct = routed.map_batches(_only_pairs, batch_format="pyarrow", zero_copy_batch=True)
    memb = routed.map_batches(_only_memb, batch_format="pyarrow", zero_copy_batch=True)
    if memb.count() == 0:  # routed is materialized — this is a cheap filter job
        return direct
    deferred = memb.groupby(TKEY).map_groups(_task_pairs, batch_format="pyarrow")
    return direct.union(deferred)
