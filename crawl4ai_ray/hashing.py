"""Stable 64-bit hashing for URLs / hosts / shingles.

The frontier design keys everything on 64-bit hashes:
``url_hash = h64(canonical_url)``, ``host_hash = h64(registrable_domain)``,
``shard_id = host_hash % num_shards``.  Hashes must be stable across
processes and across runs (they are persisted in checkpoints), so Python's
builtin ``hash`` is out.

Fast path: the ``xxhash`` C module when available (it is on a real cluster
image).  Fallback (this sandbox): ``hashlib.blake2b`` with an 8-byte digest —
also a C implementation, ~0.5 µs/call, deterministic everywhere.

Reference precedent: the reference's experimental bloom filter hashes URLs
with mmh3 (``/root/reference/crawl4ai/deep_crawling/crazy.py:102-131``); we
keep the same shape (k derived hash functions over a bit array) but a
different, dependency-free base hash.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np

try:  # pragma: no cover - not in sandbox image
    import xxhash

    def h64(s: str | bytes) -> int:
        if isinstance(s, str):
            s = s.encode("utf-8", "surrogatepass")
        return xxhash.xxh64_intdigest(s)

except ImportError:
    def h64(s: str | bytes) -> int:
        """64-bit stable hash of a string (blake2b-8 fallback)."""
        if isinstance(s, str):
            s = s.encode("utf-8", "surrogatepass")
        return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def md5_64(s: str | bytes) -> int:
    """64-bit hash = first 16 hex chars of md5, parsed big-endian.

    Used (instead of ``h64``) by the operators whose DuckDB oracle must
    recompute the same hash in SQL: md5 is the one cryptographic hash both
    sides share (`substr(md5(x), 1, 16)` hex-parsed via list_reduce).  Keep
    ``h64`` for everything internal (seen set, sharding) — it's faster."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int(hashlib.md5(s).hexdigest()[:16], 16)


def h64_with_seed(s: str | bytes, seed: int) -> int:
    """Seeded variant (for bloom k-hash derivation / minhash permutations)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(
        hashlib.blake2b(s, digest_size=8, key=seed.to_bytes(8, "little")).digest(),
        "little",
    )


def h64_batch(strings: Iterable[str]) -> np.ndarray:
    """Hash a batch of strings → uint64 array (hot path inside map_batches)."""
    return np.fromiter((h64(s) for s in strings), dtype=np.uint64)


def shard_of(host_hash: int, num_shards: int) -> int:
    return int(host_hash % num_shards)
