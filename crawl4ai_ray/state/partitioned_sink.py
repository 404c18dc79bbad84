"""Resumable partitioned parquet sink for corpus-level pipelines.

The task brief's output rule: write partitioned parquet (one directory per
key) so a failed run can skip finished partitions — never one giant file.
The crawl engine already does this per epoch (state/checkpoint.py); this is
the corpus-side twin keyed on a data column (split, lang, shard bucket).

Protocol (the standard marker dance):

1. a partition directory ``root/<col>=<value>/`` is COMPLETE iff its
   ``_SUCCESS`` marker exists; markers are written only after the whole
   write pass finishes, so a killed run can never mark a partial dir;
2. resume first DELETES unmarked partition dirs (partials from the killed
   pass — appending to them would duplicate rows), then filters completed
   partitions' rows out INSIDE the pipeline (a stateless map against the
   small done-set) and streams the rest through one
   ``write_parquet(partition_cols=[col])`` pass;
3. rows therefore land exactly once across any number of kill/resume
   cycles, and finished partitions are never re-read or re-written.

The done-set is O(distinct partition values) — driver-small by the same
bounded-key-domain argument as every partition_cols write."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa


def _partition_dirs(root: str, col: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return [d for d in os.listdir(root) if d.startswith(f"{col}=")]


def _decode_value(dirname: str) -> str:
    """Hive directory name → partition VALUE.  The pyarrow hive writer
    percent-encodes every URL-special character ('/', '=', '%', space, …),
    so ``unquote`` is the exact inverse; the done-set must store DECODED
    values or a value like ``a/b`` would never match its own directory and
    a resume would re-write its rows (exactly-once break)."""
    from urllib.parse import unquote

    return unquote(dirname.split("=", 1)[1])


def completed_partitions(root: str, col: str) -> set[str]:
    """Partition VALUES (percent-decoded) whose directory carries the
    _SUCCESS marker."""
    done = set()
    for d in _partition_dirs(root, col):
        if os.path.exists(os.path.join(root, d, "_SUCCESS")):
            done.add(_decode_value(d))
    return done


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def write_partitioned_resumable(ds, root: str, col: str) -> dict:
    """Write ``ds`` under ``root`` partitioned by ``col``, skipping
    partitions a previous (possibly killed) run completed.  Returns
    ``{"skipped": [...], "written": [...]}``.

    ``col`` must be a STRING column (enforced): the skip filter compares
    row values against hive directory names, and only strings (plus the
    explicit hive null token) round-trip that encoding losslessly — a
    float or date column could re-write rows into an already-marked
    partition and break exactly-once."""
    import pyarrow as _pa

    field = ds.schema().base_schema.field(col)
    if not (_pa.types.is_string(field.type) or _pa.types.is_large_string(field.type)):
        raise TypeError(
            f"partition column {col!r} must be string-typed for resumable "
            f"writes (got {field.type}); cast it before the sink"
        )
    os.makedirs(root, exist_ok=True)
    done = completed_partitions(root, col)

    # partials from a killed pass: no marker → delete before re-writing
    for d in _partition_dirs(root, col):
        if _decode_value(d) not in done:
            shutil.rmtree(os.path.join(root, d))

    if done:
        def _skip_done(b: pa.Table) -> pa.Table:
            mask = pa.array(
                [
                    (_HIVE_NULL if v is None else v) not in done
                    for v in b.column(col).to_pylist()
                ]
            )
            return b.filter(mask)

        ds = ds.map_batches(_skip_done, batch_format="pyarrow", zero_copy_batch=True)

    ds.write_parquet(root, partition_cols=[col])

    written = []
    for d in _partition_dirs(root, col):
        value = _decode_value(d)
        if value not in done:
            with open(os.path.join(root, d, "_SUCCESS"), "w") as f:
                f.write("")
            written.append(value)
    return {"skipped": sorted(done), "written": sorted(written)}
