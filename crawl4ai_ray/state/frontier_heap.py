"""Sharded Best-First frontier — the 10^10-URL shape of the reference's
single asyncio priority queue (bff_strategy.py:139-269).

One heap actor per shard (hash-partitioned by host, same key as the seen
and politeness shards, so a URL's frontier entry, seen bit and rate bucket
co-locate).  Each round the driver runs a K-WAY MERGE: one ``top(k)`` RPC
per shard (peek, no mutation), a merge-sort of ≤ shards×k candidate keys,
then one ``discard`` RPC per shard for the globally selected batch — so the
driver holds O(shards × batch) rows, never the frontier.

Ordering: (score desc, depth asc, url asc) — deterministic under any
arrival order.  The reference breaks score ties by global insertion
sequence; a distributed frontier has no global sequence without a
coordination point, so the scale path substitutes the url tiebreak
(documented deviation; order is bit-equal to the reference whenever scores
are distinct, and the crawled SET is always equal).

Aging/fairness (async_dispatcher.py:470-527): ``age_all(delta)`` bumps
every queued entry's priority in-place, mirroring the dispatcher's
wait-time promotion so cold entries can't starve behind a hot-score stream.
"""

from __future__ import annotations

import heapq

import ray

from ..hashing import h64


@ray.remote(num_cpus=0)
class FrontierHeapShard:
    """One shard's priority queue: entries (neg_score, depth, url, parent).
    Lazy-deletion on discard; aging adjusts a shard-level score offset so
    age_all is O(1), not O(n)."""

    def __init__(self):
        self.heap: list[tuple[float, int, str, str | None]] = []
        self.dead: set[str] = set()
        # EVER-queued membership — never removed: a popped URL re-entering
        # would always die at the pop-time visited check, and allowing
        # re-pushes corrupts the lazy-deletion bookkeeping (a fresh heap
        # entry for a discarded url would read as dead → zombie).  Each URL
        # therefore holds exactly ONE heap entry over its lifetime.  At
        # 10^10 scale swap this exact set for a bloom (it's an optimization
        # only — the sharded seen filter is the correctness gate).
        self.queued: set[str] = set()
        self.age_bonus = 0.0  # accumulated promotion (score offset)

    def push(self, rows: list[tuple[float, int, str, str | None]]) -> int:
        """rows: (score, depth, url, parent); a url enqueues at most once
        (first push wins — reference first-wins discovery semantics)."""
        n = 0
        for score, depth, url, parent in rows:
            if url in self.queued:
                continue
            # store base = score − bonus_at_push: at read time effective =
            # base + bonus_now, so only entries queued BEFORE a bump gain it
            heapq.heappush(self.heap, (-(score - self.age_bonus), depth, url, parent))
            self.queued.add(url)
            n += 1
        return n

    def age_all(self, delta: float) -> None:
        """Promote everything currently queued by ``delta`` (fairness)."""
        self.age_bonus += delta

    def top(self, k: int) -> list[tuple[float, int, str, str | None]]:
        """Peek the best ≤k live entries (score already age-adjusted)."""
        self._compact()
        out = []
        for neg, depth, url, parent in heapq.nsmallest(k + len(self.dead), self.heap):
            if url in self.dead:
                continue
            out.append((-(neg) + self.age_bonus, depth, url, parent))
            if len(out) == k:
                break
        return out

    def discard(self, urls: list[str]) -> None:
        for u in urls:
            if u in self.queued:
                self.dead.add(u)  # queued membership is permanent (see init)

    def _compact(self) -> None:
        if len(self.dead) > 64 and len(self.dead) * 2 > len(self.heap):
            self.heap = [e for e in self.heap if e[2] not in self.dead]
            heapq.heapify(self.heap)
            self.dead.clear()

    def size(self) -> int:
        return len(self.heap) - len([1 for e in self.heap if e[2] in self.dead])


class ShardedFrontierHeap:
    """Driver facade: push batches by host shard, pop global batches via
    k-way merge.  Peak driver memory per pop = O(num_shards × k)."""

    def __init__(self, num_shards: int = 4):
        self.num_shards = num_shards
        self.shards = [FrontierHeapShard.remote() for _ in range(num_shards)]

    def _shard_of(self, host: str) -> int:
        return h64(host) % self.num_shards

    def push_batch(self, rows: list[dict]) -> int:
        """rows: dicts with url, host, score, depth, parent_url."""
        buckets: dict[int, list[tuple]] = {}
        for r in rows:
            buckets.setdefault(self._shard_of(r["host"]), []).append(
                (r.get("score", 0.0), r["depth"], r["url"], r.get("parent_url"))
            )
        return sum(
            ray.get(
                [self.shards[s].push.remote(rows_s) for s, rows_s in buckets.items()]
            )
        )

    def age_all(self, delta: float) -> None:
        ray.get([s.age_all.remote(delta) for s in self.shards])

    def pop_global_batch(self, k: int) -> list[dict]:
        """K-way merge: top(k) per shard → global (score desc, depth, url)
        order → take k → discard the taken entries on their shards."""
        tops = ray.get([s.top.remote(k) for s in self.shards])
        merged = heapq.merge(
            *[
                [((-score, depth, url), (score, depth, url, parent, sid))
                 for score, depth, url, parent in shard_top]
                for sid, shard_top in enumerate(tops)
            ],
            key=lambda kv: kv[0],
        )
        taken: list[dict] = []
        to_discard: dict[int, list[str]] = {}
        for _key, (score, depth, url, parent, sid) in merged:
            if len(taken) == k:
                break
            taken.append(
                {"url": url, "depth": depth, "score": score, "parent_url": parent}
            )
            to_discard.setdefault(sid, []).append(url)
        if to_discard:
            ray.get(
                [self.shards[s].discard.remote(us) for s, us in to_discard.items()]
            )
        return taken

    def total_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            try:
                ray.kill(s)
            except Exception:
                pass
