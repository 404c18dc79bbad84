"""Resumable partitioned parquet sink (state/partitioned_sink.py).

Contract: rows land exactly once across kill/resume cycles; finished
partitions (marked _SUCCESS) are skipped; unmarked partials are wiped and
rewritten."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from crawl4ai_ray.state.partitioned_sink import (
    completed_partitions,
    write_partitioned_resumable,
)


def _ds(n=100):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), type=pa.int64()),
                "split": pa.array(
                    ["train" if i % 10 < 8 else ("val" if i % 10 == 8 else "test") for i in range(n)]
                ),
            }
        )
    )


def _read_all(root):
    import glob

    files = glob.glob(f"{root}/**/*.parquet", recursive=True)
    return pa.concat_tables(
        [pq.read_table(f, columns=["doc_id"]) for f in files]
    )


def test_fresh_write_marks_all_partitions(ray_session, tmp_path):
    root = str(tmp_path / "out")
    res = write_partitioned_resumable(_ds(), root, "split")
    assert res["skipped"] == []
    assert sorted(res["written"]) == ["test", "train", "val"]
    assert completed_partitions(root, "split") == {"train", "val", "test"}
    assert sorted(_read_all(root).column("doc_id").to_pylist()) == list(range(100))


def test_resume_skips_done_and_rewrites_partials(ray_session, tmp_path):
    root = str(tmp_path / "out")
    # simulate a killed first pass: train complete+marked, val partial
    # (unmarked), test never started
    first = write_partitioned_resumable(_ds(), root, "split")
    assert set(first["written"]) == {"train", "val", "test"}
    os.remove(os.path.join(root, "split=val", "_SUCCESS"))  # "killed" mid-val
    # corrupt val to prove it gets wiped, not appended to
    extra = pa.table({"doc_id": pa.array([999], type=pa.int64())})
    pq.write_table(extra, os.path.join(root, "split=val", "junk.parquet"))

    res = write_partitioned_resumable(_ds(), root, "split")
    assert sorted(res["skipped"]) == ["test", "train"]
    assert res["written"] == ["val"]
    # exactly-once: no duplicates, no junk row
    assert sorted(_read_all(root).column("doc_id").to_pylist()) == list(range(100))


def test_resume_noop_when_everything_done(ray_session, tmp_path):
    root = str(tmp_path / "out")
    write_partitioned_resumable(_ds(), root, "split")
    res = write_partitioned_resumable(_ds(), root, "split")
    assert res["written"] == []
    assert sorted(res["skipped"]) == ["test", "train", "val"]
    assert sorted(_read_all(root).column("doc_id").to_pylist()) == list(range(100))


def test_percent_encoded_partition_values_roundtrip(ray_session, tmp_path):
    """Round-4 ADVICE regression: the hive writer percent-encodes '/', '=',
    '%', spaces in partition VALUES; the done-set must decode directory
    names symmetrically or a resume re-writes rows into an already-marked
    partition (exactly-once break)."""
    root = str(tmp_path / "enc")
    vals = ["a/b", "x=y", "p%q", "sp ace", "plain"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(vals))), type=pa.int64()),
                "split": pa.array(vals),
            }
        )
    )
    first = write_partitioned_resumable(ds, root, "split")
    assert sorted(first["written"]) == sorted(vals)
    assert completed_partitions(root, "split") == set(vals)
    # every resume must be a full skip — zero rewritten partitions
    res = write_partitioned_resumable(ds, root, "split")
    assert res["written"] == []
    assert sorted(res["skipped"]) == sorted(vals)
    assert sorted(_read_all(root).column("doc_id").to_pylist()) == list(
        range(len(vals))
    )
