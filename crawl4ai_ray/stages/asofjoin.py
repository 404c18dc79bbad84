"""As-of join — a custom operator the Dataset API lacks (task brief:
"when the reference has an operator Ray Data lacks (as-of join, range
join, windowed aggregate), implement it as a composition of map_batches +
groupby().map_groups + sort if semantics allow").

``asof_join(left, right, ...)`` matches every left row with the LATEST
right row of the same key whose timestamp is ≤ the left timestamp
(backward as-of; ties broken by the largest ``right_tie_col``).  Shape:

    left  → tag side=0 ┐
    right → tag side=1 ┴ union → groupby(key) → map_groups(sorted merge)

Partitioning assumption (documented per the brief): the key column is the
ONE shuffle key — each group holds one key's left+right rows, merged
locally with a binary search (O((l+r) log r) per key).  Skewed keys hurt
exactly like any groupby; salt hot keys upstream if a single key's rows
exceed a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join(
    left,
    right,
    key_col: str,
    right_key_col: str | None = None,
    *,
    left_ts_col: str,
    right_ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tie_col: str | None = None,
):
    """Backward as-of join of two Datasets.  Output columns: ``left_cols``
    + ``right_cols`` (right side null when no prior right row exists).
    ``right_key_col`` defaults to ``key_col``.  Timestamps compare as
    int64 epoch-us (cast both sides)."""
    rkey = right_key_col or key_col

    def _tag_left(b: pa.Table) -> pa.Table:
        cols = {
            "_key": b.column(key_col).cast(pa.int64()),
            "_ts": b.column(left_ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
            "_side": pa.array(np.zeros(b.num_rows, dtype=np.int8), type=pa.int8()),
        }
        for c in left_cols:
            cols[f"l_{c}"] = b.column(c)
        for c in right_cols:
            cols[f"r_{c}"] = pa.nulls(b.num_rows, type=right_types[c])
        return pa.table(cols)

    def _tag_right(b: pa.Table) -> pa.Table:
        cols = {
            "_key": b.column(rkey).cast(pa.int64()),
            "_ts": b.column(right_ts_col).cast(pa.timestamp("us")).cast(pa.int64()),
            "_side": pa.array(np.ones(b.num_rows, dtype=np.int8), type=pa.int8()),
        }
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(b.num_rows, type=left_types[c])
        for c in right_cols:
            cols[f"r_{c}"] = b.column(c)
        return pa.table(cols)

    left_types = {c: left.schema().base_schema.field(c).type for c in left_cols}
    right_types = {c: right.schema().base_schema.field(c).type for c in right_cols}
    tie_field = f"r_{right_tie_col}" if right_tie_col else None

    def _merge(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("_side").to_numpy(zero_copy_only=False))
        ts = np.asarray(group.column("_ts").to_numpy(zero_copy_only=False))
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        out_cols: dict[str, pa.Array] = {}
        if len(r_idx) == 0:
            sel = group.take(pa.array(l_idx))
            for c in left_cols:
                out_cols[c] = sel.column(f"l_{c}")
            for c in right_cols:
                out_cols[c] = pa.nulls(len(l_idx), type=right_types[c])
            return pa.table(out_cols)
        # sort rights by (ts, tie): bisect lands on the max-tie row per ts
        if tie_field:
            tie = np.asarray(
                group.column(tie_field).to_numpy(zero_copy_only=False)
            )[r_idx]
            r_order = np.lexsort((tie, ts[r_idx]))
        else:
            r_order = np.argsort(ts[r_idx], kind="stable")
        r_sorted = r_idx[r_order]
        r_ts = ts[r_sorted]
        pos = np.searchsorted(r_ts, ts[l_idx], side="right") - 1
        matched = pos >= 0
        sel_left = group.take(pa.array(l_idx))
        for c in left_cols:
            out_cols[c] = sel_left.column(f"l_{c}")
        match_rows = group.take(pa.array(r_sorted[np.maximum(pos, 0)]))
        for c in right_cols:
            vals = match_rows.column(f"r_{c}")
            if matched.all():
                out_cols[c] = vals
            else:
                out_cols[c] = pa.array(
                    [v.as_py() if m else None for v, m in zip(vals, matched)],
                    type=right_types[c],
                )
        return pa.table(out_cols)

    tagged = left.map_batches(
        _tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(_tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    return tagged.groupby("_key").map_groups(_merge, batch_format="pyarrow")
