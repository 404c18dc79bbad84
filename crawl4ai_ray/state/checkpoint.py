"""Epoch-granular checkpoint store — partitioned Parquet + a JSON manifest.

Replaces the reference's per-URL JSON state callback + SQLite page cache
(/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:213-223,
async_database.py:530-542) with an idempotent, resumable layout:

    <dir>/manifest.json                 driver manifest (atomic tmp+rename)
    <dir>/docs/epoch=N/part-*.parquet   extracted documents (spans + lineage)
    <dir>/seen/epoch=N.parquet          seen-set delta added in epoch N
    <dir>/frontier/epoch=N.parquet      frontier consumed by epoch N
    <dir>/metrics/epoch=N.parquet       per-shard counters for epoch N

Resume contract (north rule): read manifest → rebuild seen shards from the
``seen`` deltas (bloom generation += 1) → continue at ``epoch+1`` without
re-fetching any URL already in ``seen``.  A partial epoch that never
committed its manifest entry is simply re-run; docs for it are overwritten
(`docs/epoch=N/` is removed before rewrite), which makes the re-run
idempotent.

The Lance format is not available in this container; this store is the
format-abstraction point — a Lance backend implements the same four table
groups with `lance.write_dataset(..., mode="append")` per epoch.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest --------------------------------------------------------
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict | None:
        try:
            with open(self.manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def write_manifest(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)

    # -- tables ----------------------------------------------------------
    def _epoch_file(self, group: str, epoch: int) -> str:
        d = os.path.join(self.root, group)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"epoch={epoch}.parquet")

    def write_epoch_table(self, group: str, epoch: int, table: pa.Table) -> None:
        pq.write_table(table, self._epoch_file(group, epoch))

    def read_epoch_table(self, group: str, epoch: int) -> pa.Table | None:
        path = self._epoch_file(group, epoch)
        if not os.path.exists(path):
            return None
        return pq.read_table(path)

    def read_group(self, group: str, upto_epoch: int | None = None) -> pa.Table | None:
        """Concatenate all epochs of a flat group (seen/frontier/metrics)."""
        d = os.path.join(self.root, group)
        if not os.path.isdir(d):
            return None
        tables = []
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet"):
                continue
            epoch = int(name[len("epoch="):-len(".parquet")])
            if upto_epoch is not None and epoch > upto_epoch:
                continue
            tables.append(pq.read_table(os.path.join(d, name)))
        if not tables:
            return None
        return pa.concat_tables(tables, promote_options="default")

    # -- docs (directory per epoch, written by ray write_parquet) --------
    def docs_epoch_dir(self, epoch: int, create: bool = True) -> str:
        d = os.path.join(self.root, "docs", f"epoch={epoch}")
        if create:
            # idempotent re-run of a partial epoch: clear then rewrite
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)
        return d

    def docs_dirs(self, upto_epoch: int | None = None) -> list[str]:
        base = os.path.join(self.root, "docs")
        if not os.path.isdir(base):
            return []
        out = []
        for name in sorted(os.listdir(base)):
            if not name.startswith("epoch="):
                continue
            epoch = int(name[len("epoch="):])
            if upto_epoch is not None and epoch > upto_epoch:
                continue
            out.append(os.path.join(base, name))
        return out
