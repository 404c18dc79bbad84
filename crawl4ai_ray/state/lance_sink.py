"""Lance-or-Parquet sink selection — the format-abstraction point the
BASELINE.json input_hint names (Lance tables of interleaved docs).

``lance`` / ``pylance`` is not installed in this container, so the writer
resolves at import time: when available, Dataset sinks go through Ray's
native ``write_lance`` / ``read_lance`` (and pyarrow tables through
``lance.write_dataset``); otherwise the layout falls back to partitioned
Parquet with identical directory semantics.  Callers never branch — they
call ``write_docs_dataset`` / ``read_docs_dataset`` and get whichever
format the environment supports (``ACTIVE_FORMAT`` says which).

On a real deployment with lance installed, nothing else changes: the
checkpoint store's epoch groups and the docs sink transparently become
Lance datasets with append-mode epochs.
"""

from __future__ import annotations

import pyarrow as pa

try:  # pragma: no cover - lance absent in this container
    import lance  # type: ignore

    HAS_LANCE = True
except ImportError:
    lance = None
    HAS_LANCE = False

ACTIVE_FORMAT = "lance" if HAS_LANCE else "parquet"


def write_docs_dataset(ds, path: str, *, use_lance: bool | None = None) -> str:
    """Sink a ray.data.Dataset of documents; returns the format used.
    ``use_lance`` forces a branch (tests); default = availability."""
    pick_lance = HAS_LANCE if use_lance is None else use_lance
    if pick_lance:
        ds.write_lance(path)  # ray-native Lance sink
        return "lance"
    ds.write_parquet(path)
    return "parquet"


def read_docs_dataset(path: str, *, columns=None, use_lance: bool | None = None):
    import ray.data

    pick_lance = HAS_LANCE if use_lance is None else use_lance
    if pick_lance:
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_table(table: pa.Table, path: str, *, mode: str = "overwrite",
                use_lance: bool | None = None) -> str:
    """Sink one pyarrow table (checkpoint epoch granularity)."""
    pick_lance = HAS_LANCE if use_lance is None else use_lance
    if pick_lance:
        lance.write_dataset(table, path, mode=mode)
        return "lance"
    import pyarrow.parquet as pq

    pq.write_table(table, path if path.endswith(".parquet") else path + ".parquet")
    return "parquet"
