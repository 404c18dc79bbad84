"""The crawl engine: a Ray-Data-native BFS/Best-First/DFS frontier loop.

Restructuring of the reference's deep-crawl strategies
(/root/reference/crawl4ai/deep_crawling/bfs_strategy.py:155-227 batch BFS,
bff_strategy.py:139-269 best-first, dfs_strategy.py:27-111 DFS) into the
epoch-loop architecture of SURVEY.md §3.4:

    driver epoch loop:
      frontier_e (checkpointed parquet)
        → repartition → map_batches(FetchStage actor pool)   [politeness RPC + fetch]
        → map_batches(extract_batch)                         [links/spans/metadata]
        → write docs_e (+ lineage columns)                   [sink]
      discovery: links → canonicalize → filter/score → seen anti-join
        → next frontier (checkpointed)

Two discovery modes:

  * ``deterministic=True`` (parity): the link-fold runs on the driver over
    the epoch's *candidate link keys only* (never the documents), replaying
    the reference's sequential semantics exactly — per-source first-wins
    visited insertion in (source frontier order, link position) order,
    per-source capacity truncation sorted by score
    (bfs_strategy.py:110-152).  This is the mode that reproduces the
    reference's crawl ordering and URL-seen set bit-for-bit.

  * ``deterministic=False`` (scale): discovery stays a Dataset pipeline end
    to end — flatten links → canonicalize → filter/score → sharded
    ``check_and_add`` inside map_batches (first caller wins).  No driver
    fold, no global sort; ordering within an epoch is free, epoch
    boundaries stay deterministic.  This is the 10^10-URL path.

Checkpoint/resume: see state/checkpoint.py.  Every docs/metrics row carries
``(frontier_epoch, shard_id, bloom_generation)`` lineage.
"""

from __future__ import annotations

import heapq
import math
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..hashing import h64
from ..schema import SEEN_SCHEMA
from ..stages.canonicalize import FilterScoreStage, canonicalize_batch
from ..stages.extract import extract_batch, extract_page
from ..stages.fetch import FetchStage
from ..stages.politeness import PolitenessPool
from ..stages.seen import SeenShardPool
from ..state.checkpoint import CheckpointStore
from ..urlnorm import (
    host_of,
    is_valid_frontier_url,
    normalize_url_for_deep_crawl,
)

INF = math.inf


@dataclass
class CrawlConfig:
    max_depth: int = 3
    max_pages: float = INF
    include_external: bool = False
    score_threshold: float = -INF
    strategy: str = "bfs"  # bfs | best_first | dfs
    # best_first: per-shard heap actors + driver k-way merge instead of one
    # driver heap (the 10^10 frontier shape; url tiebreak on score ties)
    best_first_sharded: bool = False
    num_seen_shards: int = 4
    num_politeness_shards: int = 2
    fetch_concurrency: int = 4
    fetch_batch_size: int = 128
    extract_batch_size: int = 128
    # scale-mode seen anti-join: driver-held candidate keys per round — peak
    # driver memory is O(this), never O(epoch frontier)
    seen_round_chunk: int = 65536
    # per-fetch-actor session overlap (reference max_session_permit=20,
    # async_dispatcher.py:155); forced to 1 when the politeness budget is
    # zero and the transport is in-process (CPU-bound — threads only hurt)
    max_sessions: int = 20
    base_delay: tuple[float, float] = (0.0, 0.0)
    max_delay: float = 60.0
    max_retries: int = 3
    seed: int = 42
    deterministic: bool = True
    exact_seen: bool = True
    seen_capacity_per_shard: int = 1_000_000
    seen_error_rate: float = 0.01
    filter_factory: object = None  # () -> FilterChain
    scorer_factory: object = None  # () -> URLScorer
    best_first_batch: int = 10
    # scale best-first: pop this many merge-rounds per pipeline pass —
    # popping k·batch in ONE pop_global_batch call is exactly "k successive
    # pops with no pushes between", so within-pass priority order is
    # preserved while the fixed pipeline-launch cost amortizes k×.  The
    # tradeoff (standard frontier greediness) is that discoveries from the
    # pass can't preempt URLs later in the same pass.
    best_first_rounds_per_pass: int = 8
    enrich: bool = False  # post-extract quality/langid/simhash enrichment
    keep_markdown: bool = True  # False drops the derivable markdown column
    #                             before the docs sink (spans are the
    #                             authoritative payload; halves sink bytes)
    fetch_actor_pool: bool = False  # True ⇒ actor-pool fetch stage (stateful
    #                                 transports); False ⇒ task-based (warm
    #                                 worker reuse across epochs)
    max_epochs: int | None = None  # stop after N epochs (kill point for resume tests)
    preseed_visited: bool = False  # scale mode: add seeds to seen (reference batch
    #                                BFS does NOT — bfs_strategy.py:176 leaves the
    #                                seed out of `visited`, so a link back to the
    #                                seed re-crawls it; parity keeps that quirk)


def _can_process(url: str, depth: int, filter_chain) -> bool:
    """Validity gate + filter chain, depth-0 bypasses filters
    (bfs_strategy.py:59-79)."""
    if not is_valid_frontier_url(url):
        return False
    if depth != 0 and filter_chain is not None and not filter_chain.apply(url):
        return False
    return True


def _frontier_table(rows: list[dict], epoch: int, num_shards: int) -> pa.Table:
    """rows: dicts with url, depth, parent_url, score (+ optionally the
    url_hash/host/host_hash already computed by the canonicalize stage —
    reused instead of re-deriving on the driver)."""
    urls = [r["url"] for r in rows]
    if rows and "host_hash" in rows[0]:
        hosts = [r["host"] for r in rows]
        host_hashes = [r["host_hash"] for r in rows]
        url_hashes = [r["url_hash"] for r in rows]
        return pa.table(
            {
                "frontier_rank": pa.array(range(len(rows)), type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "url_hash": pa.array(url_hashes, type=pa.uint64()),
                "host": pa.array(hosts, type=pa.string()),
                "host_hash": pa.array(host_hashes, type=pa.uint64()),
                "depth": pa.array([r["depth"] for r in rows], type=pa.int32()),
                "parent_url": pa.array(
                    [r.get("parent_url") or "" for r in rows], type=pa.string()
                ),
                "score": pa.array([r.get("score", 0.0) for r in rows], type=pa.float32()),
                "epoch": pa.array([epoch] * len(rows), type=pa.int32()),
                "shard_id": pa.array(
                    [hh % num_shards for hh in host_hashes], type=pa.int32()
                ),
            }
        )
    hosts = [host_of(u) for u in urls]
    host_hashes = [h64(h) for h in hosts]
    return pa.table(
        {
            "frontier_rank": pa.array(range(len(rows)), type=pa.int64()),
            "url": pa.array(urls, type=pa.string()),
            "url_hash": pa.array([h64(u) for u in urls], type=pa.uint64()),
            "host": pa.array(hosts, type=pa.string()),
            "host_hash": pa.array(host_hashes, type=pa.uint64()),
            "depth": pa.array([r["depth"] for r in rows], type=pa.int32()),
            "parent_url": pa.array([r.get("parent_url") or "" for r in rows], type=pa.string()),
            "score": pa.array([r.get("score", 0.0) for r in rows], type=pa.float32()),
            "epoch": pa.array([epoch] * len(rows), type=pa.int32()),
            "shard_id": pa.array(
                [hh % num_shards for hh in host_hashes], type=pa.int32()
            ),
        }
    )


def _frontier_part_from_keys(
    batch: pa.Table, rank_offset: int, epoch: int, num_shards: int
) -> pa.Table:
    """Vectorized next-frontier part built straight from a candidate-key
    chunk (scale path) — no per-row driver dicts, columns reused zero-copy."""
    n = batch.num_rows
    hh = np.asarray(batch.column("host_hash").to_numpy(zero_copy_only=False))
    depth = (
        np.asarray(batch.column("src_depth").to_numpy(zero_copy_only=False)) + 1
    ).astype(np.int32)
    return pa.table(
        {
            "frontier_rank": pa.array(
                np.arange(rank_offset, rank_offset + n), type=pa.int64()
            ),
            "url": batch.column("url"),
            "url_hash": batch.column("url_hash"),
            "host": batch.column("host"),
            "host_hash": batch.column("host_hash"),
            "depth": pa.array(depth, type=pa.int32()),
            "parent_url": batch.column("src_url"),
            "score": batch.column("score").cast(pa.float32()),
            "epoch": pa.array(np.full(n, epoch, dtype=np.int32), type=pa.int32()),
            "shard_id": pa.array((hh % num_shards).astype(np.int32), type=pa.int32()),
        }
    )


class _SeenCheckStage:
    """Stateless map_batches fn capturing seen-shard handles: sharded
    check_and_add (scale-mode anti-join; SURVEY.md §2.6)."""

    def __init__(self, shards, num_shards: int):
        self.shards = shards
        self.num_shards = num_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        buckets: dict[int, list[int]] = {}
        for i, h in enumerate(hosts):
            buckets.setdefault(h64(h) % self.num_shards, []).append(i)
        refs = {
            sid: self.shards[sid].check_and_add.remote([urls[i] for i in idx])
            for sid, idx in buckets.items()
        }
        fresh = np.zeros(len(urls), dtype=bool)
        for sid, idx in buckets.items():
            fresh[idx] = ray.get(refs[sid])
        return batch.filter(pa.array(fresh))


def _flatten_links(batch: pa.Table, include_external: bool) -> pa.Table:
    """Explode the links column of successful pages → candidate rows."""
    src_urls = batch.column("url").to_pylist()
    depths = batch.column("depth").to_pylist()
    successes = batch.column("success").to_pylist()
    ranks = (
        batch.column("frontier_rank").to_pylist()
        if "frontier_rank" in batch.column_names
        else [-1] * len(src_urls)
    )
    links_col = batch.column("links").to_pylist()
    out = {"src_url": [], "src_depth": [], "src_rank": [], "href": [], "link_pos": []}
    for src, depth, ok, rank, links in zip(src_urls, depths, successes, ranks, links_col):
        if not ok or not links:
            continue
        for link in links:
            if not link["internal"] and not include_external:
                continue
            out["src_url"].append(src)
            out["src_depth"].append(depth)
            out["src_rank"].append(rank)
            out["href"].append(link["href"])
            out["link_pos"].append(link["link_pos"])
    return pa.table(
        {
            "src_url": pa.array(out["src_url"], type=pa.string()),
            "src_depth": pa.array(out["src_depth"], type=pa.int32()),
            "src_rank": pa.array(out["src_rank"], type=pa.int64()),
            "href": pa.array(out["href"], type=pa.string()),
            "link_pos": pa.array(out["link_pos"], type=pa.int32()),
        }
    )


class CrawlEngine:
    def __init__(
        self,
        transport,
        config: CrawlConfig,
        checkpoint_dir: str,
        robots_bodies: dict[str, str] | None = None,
    ):
        self.transport = transport
        self.config = config
        self.store = CheckpointStore(checkpoint_dir)
        self.robots_bodies = robots_bodies
        self.seen = SeenShardPool(
            config.num_seen_shards,
            capacity_per_shard=config.seen_capacity_per_shard,
            error_rate=config.seen_error_rate,
            exact=config.exact_seen,
        )
        self.politeness = PolitenessPool(
            config.num_politeness_shards,
            robots_bodies=robots_bodies,
            base_delay=config.base_delay,
            max_delay=config.max_delay,
            max_retries=config.max_retries,
            seed=config.seed,
        )
        self.pages_crawled = 0
        self.filter_chain = (
            config.filter_factory() if config.filter_factory else None
        )
        self.scorer = config.scorer_factory() if config.scorer_factory else None
        # serializable stage closures built ONCE and reused by every epoch's
        # tasks (filters/scorers compile here, not per batch; warm Ray
        # workers deserialize the already-built objects)
        zero_budget = tuple(config.base_delay) == (0.0, 0.0)
        local_robots = None
        if zero_budget:
            from ..state.politeness import RobotsGate

            local_robots = RobotsGate(robots_bodies)
        self._fetch_fn = FetchStage(
            transport=self.transport,
            politeness_shards=self.politeness.shards,
            num_politeness_shards=config.num_politeness_shards,
            local_robots=local_robots,
            # session overlap pays only when fetches actually wait (network
            # I/O or politeness sleeps); with a zero budget and an in-process
            # transport the work is CPU-bound and threads just add GIL
            # contention — measured 723→537 URLs/s on the sf0.1 bench
            max_sessions=1 if zero_budget else getattr(config, "max_sessions", 20),
        )
        self._filter_stage = FilterScoreStage(
            filter_factory=config.filter_factory,
            scorer_factory=config.scorer_factory,
            filter_url_col="href",
            score_url_col="url",
        )
        self._seen_check_stage = _SeenCheckStage(
            self.seen.shards, config.num_seen_shards
        )
        # run_iter() hook: called with the epoch number right after that
        # epoch's docs + manifest are durable (commit point)
        self._epoch_listener = None

    def shutdown(self) -> None:
        """Kill shard actors (tests create many engines per session)."""
        import ray as _ray

        for a in self.seen.shards + self.politeness.shards:
            try:
                _ray.kill(a)
            except Exception:
                pass

    # ------------------------------------------------------------- setup
    def _seed_frontier(self, seeds: list[str], epoch: int) -> pa.Table:
        rows = []
        for s in seeds:
            canon = normalize_url_for_deep_crawl(s, s)
            if canon and is_valid_frontier_url(canon):
                rows.append({"url": canon, "depth": 0, "parent_url": None, "score": 0.0})
        return _frontier_table(rows, epoch, self.config.num_seen_shards)

    def _resume_state(self) -> tuple[int, pa.Table | None]:
        manifest = self.store.read_manifest()
        if manifest is None:
            return (0, None)
        last_done = manifest["epoch"]
        self.pages_crawled = manifest["pages_crawled"]
        seen_tbl = self.store.read_group("seen", upto_epoch=last_done)
        if seen_tbl is not None and seen_tbl.num_rows:
            urls = seen_tbl.column("url").to_pylist()
            hosts = [host_of(u) for u in urls]
            self.seen.load_partitioned(urls, hosts)
        nxt = self.store.read_epoch_table("frontier", last_done + 1)
        return (last_done + 1, nxt)

    # ------------------------------------------------------------ epochs
    def _stage_frontier(self, frontier: pa.Table, epoch: int, group: str = "frontier_in") -> str:
        """Stage a frontier table as a directory of parquet part files sized
        for full read fan-out (≤ 4×CPUs files)."""
        n = frontier.num_rows
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        target_files = max(1, min(math.ceil(n / 64), 4 * cpus))
        rows_per_file = math.ceil(n / target_files)
        return self.store.write_epoch_sharded(group, epoch, frontier, rows_per_file)

    def _transform_from_ds(self, ds, epoch: int):
        """Attach fetch → extract (→ enrich) → lineage to a frontier Dataset."""
        cfg = self.config
        if getattr(cfg, "fetch_actor_pool", False):
            ds = ds.map_batches(
                FetchStage,
                fn_constructor_kwargs={
                    "transport": self.transport,
                    "politeness_shards": self.politeness.shards,
                    "num_politeness_shards": cfg.num_politeness_shards,
                },
                batch_size=cfg.fetch_batch_size,
                batch_format="pyarrow",
                concurrency=(1, cfg.fetch_concurrency),
                zero_copy_batch=True,
            )
        else:
            ds = ds.map_batches(
                self._fetch_fn,
                batch_size=None,  # batch == block; parallelism is set by the
                #                   input file count (coalescing to a target
                #                   batch_size would merge small epochs into
                #                   one or two tasks)
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        ds = ds.map_batches(
            extract_batch,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if getattr(cfg, "enrich", False):
            from ..stages.extract import enrich_batch

            ds = ds.map_batches(
                enrich_batch,
                batch_size=None,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

        gens = self.seen.generations()
        bloom_gen = max(gens) if gens else 0
        keep_markdown = getattr(cfg, "keep_markdown", True)

        def _add_lineage(batch: pa.Table) -> pa.Table:
            if not keep_markdown and "markdown" in batch.column_names:
                batch = batch.drop_columns(["markdown"])
            n = batch.num_rows
            batch = batch.append_column(
                "doc_id",
                pa.array(
                    [f"{h64(u):016x}" for u in batch.column("url").to_pylist()],
                    type=pa.string(),
                ),
            )
            batch = batch.append_column(
                "frontier_epoch", pa.array([epoch] * n, type=pa.int32())
            )
            batch = batch.append_column(
                "bloom_generation", pa.array([bloom_gen] * n, type=pa.int32())
            )
            return batch

        return ds.map_batches(
            _add_lineage, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )

    def _epoch_transform_ds(self, frontier: pa.Table, epoch: int):
        """Stage a frontier table to parquet parts (read fan-out: one read
        task per file — a single file's block generator trickles through
        backpressure and serializes the epoch; from_arrow on table slices
        re-pickles the parent buffer per slice) and attach the transform
        chain.  Task-based map_batches reuses warm workers across epochs."""
        input_dir = self._stage_frontier(frontier, epoch)
        return self._transform_from_ds(ray.data.read_parquet(input_dir), epoch)

    def _run_epoch_pipeline(self, frontier: pa.Table, epoch: int):
        """Parity path: ONE streaming execution fetch→extract→lineage→parquet,
        then a column-PRUNED readback (links + bookkeeping only — the wide
        doc payload never round-trips) materialized for the driver fold."""
        t0 = time.time()
        ds = self._epoch_transform_ds(frontier, epoch)
        docs_dir = self.store.docs_epoch_dir(epoch)
        ds.write_parquet(docs_dir)
        ext = ray.data.read_parquet(
            docs_dir,
            columns=[
                "frontier_rank", "url", "depth", "success", "links", "shard_id",
            ],
        ).materialize()
        return ext, time.time() - t0

    def _epoch_candidate_ds(self, input_dir: str, epoch: int):
        """One epoch's streaming chain up to the gated candidate keys
        (shared by BFS-scale and Best-First-scale):

            read frontier parts → fetch → extract (→ enrich) → lineage
              → sink docs part + prune      (write docs, forward link keys)
              → flatten → canonicalize → filter/score → depth gate
              → intra-batch first-wins dedup
        """
        import uuid

        cfg = self.config
        ds = self._transform_from_ds(ray.data.read_parquet(input_dir), epoch)
        docs_dir = self.store.docs_epoch_dir(epoch)

        def _sink_and_prune(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            pq.write_table(batch, f"{docs_dir}/part-{uuid.uuid4().hex}.parquet")
            return batch.select(["url", "depth", "success", "links"])

        pruned = ds.map_batches(
            _sink_and_prune, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        cand = pruned.map_batches(
            lambda b: _flatten_links(b, cfg.include_external),
            batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
        )
        cand = cand.map_batches(
            lambda b: canonicalize_batch(b, base_url_col="src_url"),
            batch_size=None, batch_format="pyarrow", zero_copy_batch=True,
        )
        cand = cand.map_batches(
            self._filter_stage, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        max_depth = cfg.max_depth
        threshold = cfg.score_threshold

        def _gate(batch: pa.Table) -> pa.Table:
            depth_ok = (
                np.asarray(batch.column("src_depth").to_numpy(zero_copy_only=False)) + 1
                <= max_depth
            )
            passed = np.asarray(batch.column("passed").to_numpy(zero_copy_only=False))
            score_ok = (
                np.asarray(batch.column("score").to_numpy(zero_copy_only=False))
                >= threshold
            )
            return batch.filter(pa.array(depth_ok & passed & score_ok))

        cand = cand.map_batches(
            _gate, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )

        # intra-batch first-wins dedup before any driver round: shrinks the
        # key stream (duplicate targets are common within an epoch)
        def _local_dedup(batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            seen_local: set[str] = set()
            keep = np.empty(len(urls), dtype=bool)
            for i, u in enumerate(urls):
                fresh = u not in seen_local
                keep[i] = fresh
                if fresh:
                    seen_local.add(u)
            return batch.filter(pa.array(keep))

        return cand.map_batches(
            _local_dedup, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )

    def _run_epoch_scale(self, input_dir: str, epoch: int):
        """Scale path: ONE streaming execution per epoch, and the driver
        never holds a row.  The chain is

            read frontier parts → fetch → extract (→ enrich) → lineage
              → sink docs part + prune      (write docs, forward link keys)
              → flatten → canonicalize → filter/score → depth gate
              → sharded check_and_add       (first caller wins)
              → emit next-frontier part     (write parquet, forward count)

        so all the driver collects is one count per batch plus the
        politeness-shard counters (metrics).  The next epoch reads the
        frontier parts this epoch wrote; those parts double as the seen-set
        delta for resume (scale mode adds to seen exactly what enters the
        frontier)."""
        cfg = self.config
        t0 = time.time()
        next_dir = os.path.join(self.store.root, "frontier", f"epoch={epoch + 1}")
        shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)
        next_epoch = epoch + 1
        num_shards = cfg.num_seen_shards
        cand = self._epoch_candidate_ds(input_dir, epoch)
        # Seen anti-join: CHUNKED scatter-gather rounds over candidate KEYS
        # only (url/hashes/host/depth/parent/score — never the documents).
        # ``iter_batches`` preserves pipeline block order, so the per-chunk
        # check_and_add elects the SAME first-wins winners as a single
        # ordered round, while peak driver memory is O(seen_round_chunk)
        # instead of O(epoch frontier) — at the 10^10-URL design point an
        # epoch's key set can be tens of GB, which must never sit on the
        # driver at once.  Each fresh chunk is staged straight into the
        # next-frontier directory (the parts double as the seen-set resume
        # delta).  In-task ray.get on the shard actors stalls workers and
        # triggers raylet spawn storms at high parallelism, so driver-paced
        # rounds stay.
        import pyarrow.parquet as _pq

        keys = cand.select_columns(
            ["url", "url_hash", "host", "host_hash", "src_depth", "src_url", "score"]
        )
        next_n = 0
        part_seq = 0
        for batch in keys.iter_batches(
            batch_size=cfg.seen_round_chunk, batch_format="pyarrow"
        ):
            if batch.num_rows == 0:
                continue
            fresh = self.seen.check_and_add(
                batch.column("url").to_pylist(), batch.column("host").to_pylist()
            )
            fresh_tbl = batch.filter(pa.array(fresh))
            if fresh_tbl.num_rows == 0:
                continue
            part = _frontier_part_from_keys(
                fresh_tbl, rank_offset=next_n, epoch=next_epoch,
                num_shards=num_shards,
            )
            _pq.write_table(part, f"{next_dir}/part-{part_seq:05d}.parquet")
            part_seq += 1
            next_n += part.num_rows

        counters = ray.get(
            [s.drain_counters.remote() for s in self.politeness.shards]
        )
        fetched = sum(c["fetched"] for c in counters)
        self.pages_crawled += fetched
        remaining = cfg.max_pages - self.pages_crawled
        if next_n > remaining:
            next_n = self._trim_frontier_dir(
                next_dir, int(max(0, remaining)), next_epoch, num_shards
            )
        wall = time.time() - t0
        m = self._write_metrics_from_counters(counters, epoch, wall)
        return (next_dir if next_n else None), next_n, m, wall

    def _trim_frontier_dir(
        self, next_dir: str, keep_n: int, epoch: int, num_shards: int
    ) -> int:
        """max_pages cap on a staged frontier: keep the global top-``keep_n``
        rows by (score desc, url asc) — a BOUNDED heap (heapq.nsmallest holds
        ≤ keep_n rows) over the streamed parts, then restage.  Only runs in
        the crawl's final epochs when the cap actually binds."""
        import heapq

        if keep_n <= 0:
            shutil.rmtree(next_dir, ignore_errors=True)
            os.makedirs(next_dir, exist_ok=True)
            return 0

        def _iter_rows():
            ds = ray.data.read_parquet(
                next_dir,
                columns=[
                    "url", "url_hash", "host", "host_hash", "depth",
                    "parent_url", "score",
                ],
            )
            for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
                yield from b.to_pylist()

        rows = heapq.nsmallest(
            keep_n, _iter_rows(), key=lambda r: (-r["score"], r["url"])
        )
        tbl = _frontier_table(rows, epoch, num_shards)
        self._stage_frontier(tbl, epoch, group="frontier")
        return len(rows)

    def _write_metrics_from_counters(
        self, counters: list[dict], epoch: int, wall_s: float
    ) -> dict:
        """Metrics table from politeness-shard counters (scale path)."""
        gens = self.seen.generations()
        bloom_gen = max(gens) if gens else 0
        n = len(counters)
        tbl = pa.table(
            {
                "epoch": pa.array([epoch] * n, type=pa.int32()),
                "shard_id": pa.array(list(range(n)), type=pa.int32()),
                "bloom_generation": pa.array([bloom_gen] * n, type=pa.int32()),
                "fetched": pa.array([c["fetched"] for c in counters], type=pa.int64()),
                "skipped": pa.array([c["denied"] for c in counters], type=pa.int64()),
                "failed": pa.array([c["failed"] for c in counters], type=pa.int64()),
                "wall_s": pa.array([wall_s] * n, type=pa.float64()),
            }
        )
        self.store.write_epoch_table("metrics", epoch, tbl)
        return {
            "fetched": sum(c["fetched"] for c in counters),
            "failed": sum(c["failed"] + c["denied"] for c in counters),
        }

    # ------------------------------------------------ parity-mode discovery
    def _discover_deterministic(self, ext, epoch: int) -> list[dict]:
        """Driver fold over candidate link keys, replaying the reference's
        sequential link_discovery (bfs_strategy.py:81-152) in
        (source frontier order, link position) order."""
        cfg = self.config
        cand = (
            ext.select_columns(["frontier_rank", "url", "depth", "success", "links"])
            .take_all()
        )
        cand.sort(key=lambda r: r["frontier_rank"])

        # pre-normalize all candidate links + bulk prior-seen query
        all_norms: list[str] = []
        per_source: list[dict] = []
        for row in cand:
            links = [
                l
                for l in (row["links"] if row["links"] is not None else [])
                if l["internal"] or cfg.include_external
            ]
            norms = [
                normalize_url_for_deep_crawl(l["href"], row["url"]) for l in links
            ]
            per_source.append({**row, "links": links, "norms": norms})
            all_norms.extend(n for n in norms if n)
        uniq = list(dict.fromkeys(all_norms))
        if uniq:
            prior_mask = self.seen.contains(uniq, [host_of(u) for u in uniq])
            prior = {u for u, m in zip(uniq, prior_mask) if m}
        else:
            prior = set()

        next_frontier: list[dict] = []
        newly_seen: list[str] = []
        local_seen: set[str] = set()
        for row in per_source:
            if not row["success"]:
                continue
            self.pages_crawled += 1
            next_depth = row["depth"] + 1
            if next_depth > cfg.max_depth:
                continue
            remaining = cfg.max_pages - self.pages_crawled
            if remaining <= 0:
                continue
            valid: list[tuple[str, float]] = []
            for link, norm in zip(row["links"], row["norms"]):
                if norm is None or norm in prior or norm in local_seen:
                    continue
                if not _can_process(link["href"], next_depth, self.filter_chain):
                    continue
                score = self.scorer.score(norm) if self.scorer else 0.0
                if score < cfg.score_threshold:
                    continue
                local_seen.add(norm)
                newly_seen.append(norm)
                valid.append((norm, score))
            if len(valid) > remaining:
                if self.scorer:
                    valid.sort(key=lambda x: x[1], reverse=True)
                valid = valid[: int(remaining)]
            for u, s in valid:
                next_frontier.append(
                    {"url": u, "depth": next_depth, "parent_url": row["url"], "score": s}
                )

        if newly_seen:
            self.seen.add(newly_seen, [host_of(u) for u in newly_seen])
        self._write_seen_delta(newly_seen, epoch)
        return next_frontier

    # ---------------------------------------------------------- checkpoints
    def _write_seen_delta(
        self,
        urls: list[str],
        epoch: int,
        url_hashes: list[int] | None = None,
        host_hashes: list[int] | None = None,
    ) -> None:
        if url_hashes is None:
            url_hashes = [h64(u) for u in urls]
        if host_hashes is None:
            host_hashes = [h64(host_of(u)) for u in urls]
        tbl = pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "url_hash": pa.array(url_hashes, type=pa.uint64()),
                "shard_id": pa.array(
                    [hh % self.config.num_seen_shards for hh in host_hashes],
                    type=pa.int32(),
                ),
                "epoch": pa.array([epoch] * len(urls), type=pa.int32()),
            },
            schema=SEEN_SCHEMA,
        )
        self.store.write_epoch_table("seen", epoch, tbl)

    def _write_metrics(self, ext, epoch: int, wall_s: float) -> dict:
        # partial aggregation inside map_batches (one row per shard per
        # batch), tiny final fold on the driver — never row-level collect
        def _partial(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            shard = np.asarray(b.column("shard_id").to_numpy(zero_copy_only=False))
            success = np.asarray(
                b.column("success").to_numpy(zero_copy_only=False)
            ).astype(bool)
            sids = np.unique(shard)
            return pa.table(
                {
                    "shard_id": pa.array(sids.tolist(), type=pa.int32()),
                    "fetched": pa.array(
                        [int(success[shard == s].sum()) for s in sids], type=pa.int64()
                    ),
                    "failed": pa.array(
                        [int((~success[shard == s]).sum()) for s in sids],
                        type=pa.int64(),
                    ),
                }
            )

        stats = ext.map_batches(
            _partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        per_shard: dict[int, dict] = {}
        for r in stats:
            d = per_shard.setdefault(r["shard_id"], {"fetched": 0, "failed": 0})
            d["fetched"] += r["fetched"]
            d["failed"] += r["failed"]
        gens = self.seen.generations()
        bloom_gen = max(gens) if gens else 0
        tbl = pa.table(
            {
                "epoch": pa.array([epoch] * len(per_shard), type=pa.int32()),
                "shard_id": pa.array(list(per_shard), type=pa.int32()),
                "bloom_generation": pa.array([bloom_gen] * len(per_shard), type=pa.int32()),
                "fetched": pa.array([d["fetched"] for d in per_shard.values()], type=pa.int64()),
                "skipped": pa.array([0] * len(per_shard), type=pa.int64()),
                "failed": pa.array([d["failed"] for d in per_shard.values()], type=pa.int64()),
                "wall_s": pa.array([wall_s] * len(per_shard), type=pa.float64()),
            }
        )
        self.store.write_epoch_table("metrics", epoch, tbl)
        return {
            "fetched": sum(d["fetched"] for d in per_shard.values()),
            "failed": sum(d["failed"] for d in per_shard.values()),
        }

    # ---------------------------------------------------------------- run
    def run(self, seeds: list[str], resume: bool = False) -> dict:
        if self.config.strategy == "bfs":
            return self._run_bfs(seeds, resume)
        if self.config.strategy == "best_first":
            if self.config.deterministic:
                return self._run_best_first(seeds)
            return self._run_best_first_scale(seeds)
        if self.config.strategy == "dfs":
            return self._run_dfs(seeds)
        raise ValueError(f"unknown strategy {self.config.strategy}")

    def _notify_epoch(self, epoch: int) -> None:
        if self._epoch_listener is not None:
            self._epoch_listener(epoch)

    def run_iter(self, seeds: list[str], resume: bool = False,
                 max_buffered_epochs: int = 2):
        """Per-epoch streaming results — the reference's ``stream=True``
        mode (async_webcrawler.py:873-891, dispatcher ``run_urls_stream``
        yields each CrawlResult as it completes) re-expressed at this
        engine's epoch granularity: yields ``(epoch, docs Dataset)`` as
        each epoch COMMITS (docs parquet + manifest durable), while later
        epochs keep crawling in a background thread — the consumer
        pipelines downstream work against epoch k while the engine fetches
        epoch k+1.

        ``max_buffered_epochs`` bounds the queue: when the consumer lags
        that far behind, the crawl thread blocks at the next commit point
        (backpressure — unconsumed epochs never pile up unboundedly).
        Checkpoint/resume semantics are exactly ``run()``'s: the listener
        fires after the durable write, so a kill mid-iteration resumes
        from the same place either way.  The final summary dict is exposed
        as ``self.last_run_stats`` after exhaustion (and raised exceptions
        propagate).  DFS is serial with no epoch structure — use ``run()``.
        """
        import queue as _queue
        import threading

        if self.config.strategy == "dfs":
            raise ValueError("run_iter: dfs has no epoch structure; use run()")

        q: _queue.Queue = _queue.Queue(maxsize=max(1, max_buffered_epochs))
        done = object()
        box: dict = {}

        self._epoch_listener = q.put  # blocks when full → backpressure

        def _crawl():
            try:
                box["stats"] = self.run(seeds, resume=resume)
            except BaseException as e:  # surface on the consumer side
                box["error"] = e
            finally:
                q.put(done)

        t = threading.Thread(target=_crawl, daemon=True, name="crawl-run_iter")
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                # create=False: the default CLEARS the dir for an idempotent
                # epoch re-run — here we only read what the epoch committed
                docs_dir = self.store.docs_epoch_dir(item, create=False)
                if not os.path.isdir(docs_dir) or not any(
                    f.endswith(".parquet") for f in os.listdir(docs_dir)
                ):
                    continue  # epoch fetched nothing (all-robots-blocked etc.)
                yield item, ray.data.read_parquet(docs_dir)
        finally:
            self._epoch_listener = None
            # consumer may abandon the iterator early while the crawl
            # thread is blocked on a full queue: drain until it exits
            # (the crawl itself runs to completion — commits are durable)
            while t.is_alive():
                try:
                    q.get(timeout=0.1)
                except _queue.Empty:
                    pass
            t.join()
        if "error" in box:
            raise box["error"]
        self.last_run_stats = box["stats"]

    def revalidate_and_refresh(self, concurrency: int = 8) -> dict:
        """Smart-Cache resume (reference async_webcrawler.py:273-315 +
        cache_validator.py): instead of skipping seen URLs forever, read the
        cached validator catalog (url, etag, last_modified,
        head_fingerprint — persisted by FetchStage/extract_batch), run the
        two-layer revalidation per URL (RevalidateStage actor pool:
        conditional request → 304 = fresh; else head fetch → fingerprint
        match = fresh), and refetch ONLY the stale URLs as a fresh docs
        epoch.  Fresh and errored URLs keep their cached docs (error → use
        cache, reference semantics).  The stale refetch reuses the normal
        fetch→extract→lineage chain but skips frontier re-expansion: link
        discovery already ran for these pages and seen gating is unchanged.

        The catalog is (url + 3 short strings) per cached page — the doc
        bodies never enter this pipeline; the latest-epoch-per-url pick is
        one groupby(url) over that catalog."""
        import pyarrow.compute as pc

        from ..stages.revalidate import RevalidateStage

        dirs = self.store.docs_dirs()
        zero = {"checked": 0, "fresh_304": 0, "fresh_fingerprint": 0,
                "stale": 0, "error": 0, "refetched": 0}
        if not dirs:
            return zero
        files = [
            os.path.join(d, f)
            for d in dirs
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        if not files:
            return zero
        cat = ray.data.read_parquet(
            files,
            columns=["url", "depth", "etag", "last_modified",
                     "head_fingerprint", "frontier_epoch", "success"],
        )
        cat = cat.map_batches(
            lambda b: b.filter(pc.equal(b.column("success"), True)),
            batch_format="pyarrow", zero_copy_batch=True,
        )

        def _latest(group: pa.Table) -> pa.Table:
            i = pc.index(
                group.column("frontier_epoch"),
                pc.max(group.column("frontier_epoch")),
            ).as_py()
            return group.slice(i, 1)

        cat = cat.groupby("url").map_groups(_latest, batch_format="pyarrow")
        rv = cat.map_batches(
            RevalidateStage,
            fn_constructor_kwargs=dict(transport=self.transport),
            batch_format="pyarrow",
            concurrency=(1, concurrency),
            zero_copy_batch=True,
        ).materialize()  # url + verdict + validators — catalog-sized, not corpus-sized
        counts = dict(zero)
        for r in rv.groupby("verdict").count().take_all():
            counts[r["verdict"]] = r["count()"]
        counts["checked"] = sum(
            counts[k] for k in ("fresh_304", "fresh_fingerprint", "stale", "error")
        )
        if counts["stale"] == 0:
            return counts

        next_epoch = 1 + max(
            int(d.rsplit("epoch=", 1)[1]) for d in dirs
        )
        refetched = 0
        stale_ds = rv.map_batches(
            lambda b: b.filter(pc.equal(b.column("verdict"), "stale")).select(
                ["url", "depth"]
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # stream stale URLs in bounded driver chunks (seen_round_chunk
        # pattern), one refetch pipeline per chunk
        rows: list[dict] = []
        chunk = self.config.seen_round_chunk
        for b in stale_ds.iter_batches(batch_size=chunk, batch_format="pyarrow"):
            rows.extend(
                {"url": u, "depth": int(d), "parent_url": None, "score": 0.0}
                for u, d in zip(
                    b.column("url").to_pylist(), b.column("depth").to_pylist()
                )
            )
            if len(rows) >= chunk:
                refetched += self._refetch_epoch(rows, next_epoch)
                next_epoch += 1
                rows = []
        if rows:
            refetched += self._refetch_epoch(rows, next_epoch)
        counts["refetched"] = refetched
        return counts

    def _refetch_epoch(self, rows: list[dict], epoch: int) -> int:
        """Fetch+extract+lineage the given URLs into a fresh docs epoch
        (revalidation refresh — no frontier expansion, no seen mutation)."""
        frontier = _frontier_table(rows, epoch, self.config.num_seen_shards)
        ds = self._epoch_transform_ds(frontier, epoch)
        docs_dir = self.store.docs_epoch_dir(epoch)
        ds.write_parquet(docs_dir)
        n = len(rows)
        manifest = self.store.read_manifest() or {}
        manifest.update({"revalidation_epoch": epoch, "revalidation_refetched": n})
        self.store.write_manifest(manifest)
        return n

    def _run_bfs(self, seeds: list[str], resume: bool) -> dict:
        if self.config.deterministic:
            return self._run_bfs_parity(seeds, resume)
        return self._run_bfs_scale(seeds, resume)

    def _run_bfs_parity(self, seeds: list[str], resume: bool) -> dict:
        cfg = self.config
        epoch = 0
        frontier: pa.Table | None = None
        if resume:
            epoch, frontier = self._resume_state()
        if frontier is None and epoch == 0:
            frontier = self._seed_frontier(seeds, 0)
        total_fetched = 0
        epochs_run = 0
        t_start = time.time()
        while (
            frontier is not None
            and frontier.num_rows > 0
            and self.pages_crawled < cfg.max_pages
        ):
            if cfg.max_epochs is not None and epochs_run >= cfg.max_epochs:
                break
            self.store.write_epoch_table(
                "frontier", epoch, frontier, row_group_size=cfg.fetch_batch_size
            )
            ext, wall = self._run_epoch_pipeline(frontier, epoch)
            m = self._write_metrics(ext, epoch, wall)
            # fold increments pages_crawled per success in frontier order
            next_rows = self._discover_deterministic(ext, epoch)
            total_fetched += m["fetched"]
            next_table = (
                _frontier_table(next_rows, epoch + 1, cfg.num_seen_shards)
                if next_rows
                else None
            )
            if next_table is not None:
                self.store.write_epoch_table(
                    "frontier", epoch + 1, next_table,
                    row_group_size=cfg.fetch_batch_size,
                )
            self.store.write_manifest(
                {
                    "strategy": "bfs",
                    "epoch": epoch,
                    "pages_crawled": self.pages_crawled,
                    "num_seen_shards": cfg.num_seen_shards,
                    "bloom_generations": self.seen.generations(),
                    "deterministic": True,
                }
            )
            self._notify_epoch(epoch)
            frontier = next_table
            epoch += 1
            epochs_run += 1
        wall_total = time.time() - t_start
        return {
            "epochs": epoch,
            "pages_crawled": self.pages_crawled,
            "fetched": total_fetched,
            "seen_size": self.seen.total_size(),
            "wall_s": wall_total,
            "urls_per_s": total_fetched / wall_total if wall_total > 0 else 0.0,
        }

    def _run_bfs_scale(self, seeds: list[str], resume: bool) -> dict:
        """Throughput path: frontier lives as parquet part directories; the
        driver moves only directory names, counts and counters between
        epochs (SURVEY.md §3.4 at 10^10 scale)."""
        cfg = self.config
        epoch = 0
        input_dir: str | None = None
        n = 0
        if resume:
            epoch, input_dir, n = self._resume_scale()
        if input_dir is None and epoch == 0:
            seed_tbl = self._seed_frontier(seeds, 0)
            if cfg.preseed_visited:
                urls = seed_tbl.column("url").to_pylist()
                self.seen.add(urls, [host_of(u) for u in urls])
            input_dir = self._stage_frontier(seed_tbl, 0, group="frontier")
            n = seed_tbl.num_rows
        total_fetched = 0
        epochs_run = 0
        t_start = time.time()
        while input_dir and n > 0 and self.pages_crawled < cfg.max_pages:
            if cfg.max_epochs is not None and epochs_run >= cfg.max_epochs:
                break
            next_dir, next_n, m, wall = self._run_epoch_scale(input_dir, epoch)
            total_fetched += m["fetched"]
            self.store.write_manifest(
                {
                    "strategy": "bfs",
                    "epoch": epoch,
                    "pages_crawled": self.pages_crawled,
                    "num_seen_shards": cfg.num_seen_shards,
                    "bloom_generations": self.seen.generations(),
                    "deterministic": False,
                    "seen_source": "frontier_dirs",
                    "preseed_visited": cfg.preseed_visited,
                }
            )
            self._notify_epoch(epoch)
            input_dir, n = next_dir, next_n
            epoch += 1
            epochs_run += 1
        wall_total = time.time() - t_start
        return {
            "epochs": epoch,
            "pages_crawled": self.pages_crawled,
            "fetched": total_fetched,
            "seen_size": self.seen.total_size(),
            "wall_s": wall_total,
            "urls_per_s": total_fetched / wall_total if wall_total > 0 else 0.0,
        }

    def _resume_scale(self) -> tuple[int, str | None, int]:
        """Rebuild seen shards from the frontier part dirs (epochs ≥ 1 hold
        exactly the URLs added to seen; epoch 0 seeds only under
        preseed_visited) and continue at the last uncompleted epoch."""
        import pyarrow.parquet as pq

        manifest = self.store.read_manifest()
        if manifest is None:
            return (0, None, 0)
        last_done = manifest["epoch"]
        self.pages_crawled = manifest["pages_crawled"]
        urls: list[str] = []
        start = 0 if manifest.get("preseed_visited") else 1
        for e in range(start, last_done + 2):
            d = os.path.join(self.store.root, "frontier", f"epoch={e}")
            if os.path.isdir(d) and os.listdir(d):
                urls.extend(pq.read_table(d, columns=["url"]).column("url").to_pylist())
        if urls:
            self.seen.load_partitioned(urls, [host_of(u) for u in urls])
        nxt = os.path.join(self.store.root, "frontier", f"epoch={last_done + 1}")
        if os.path.isdir(nxt) and os.listdir(nxt):
            n = pq.read_table(nxt, columns=["url"]).num_rows
            return (last_done + 1, nxt, n)
        return (last_done + 1, None, 0)

    # ------------------------------------------------------- best-first
    def _run_best_first(self, seeds: list[str]) -> dict:
        """Driver-heap Best-First (parity with bff_strategy.py:139-269):
        one global priority queue ordered (-score, depth, seq); URLs join
        ``visited`` at POP time (bff:205-207 — unlike BFS, duplicates may sit
        in the queue); link_discovery applies validity+filters but NO score
        threshold (bff:92-137); batches of ``best_first_batch`` run through
        the same Ray fetch+extract pipeline; processing stops mid-batch when
        max_pages is reached (bff:233-238).

        ``cfg.best_first_sharded`` switches the queue to per-shard heap
        actors + a driver k-way merge (state/frontier_heap.py — the 10^10
        shape: the driver holds O(shards×batch) rows per round, never the
        frontier).  Score ties then break by url instead of the reference's
        global insertion seq (a distributed frontier has no global seq);
        the crawled SET matches, and order matches whenever scores are
        distinct."""
        cfg = self.config
        sharded = getattr(cfg, "best_first_sharded", False)
        sheap = None
        heap: list[tuple[float, int, int, str, str | None]] = []
        if sharded:
            from ..state.frontier_heap import ShardedFrontierHeap

            sheap = ShardedFrontierHeap(cfg.num_seen_shards)
        seq = 0
        visited: set[str] = set()
        depths: dict[str, int] = {}
        seed_rows: list[dict] = []
        for s in seeds:
            canon = normalize_url_for_deep_crawl(s, s)
            if canon and is_valid_frontier_url(canon):
                score = self.scorer.score(canon) if self.scorer else 0.0
                if sharded:
                    seed_rows.append(
                        {"url": canon, "host": host_of(canon), "score": score,
                         "depth": 0, "parent_url": None}
                    )
                else:
                    heapq.heappush(heap, (-score, 0, seq, canon, None))
                depths[canon] = 0
                seq += 1
        if sharded and seed_rows:
            sheap.push_batch(seed_rows)
        batch_idx = 0
        total_fetched = 0
        t_start = time.time()
        while (sheap.total_size() if sharded else len(heap)) and self.pages_crawled < cfg.max_pages:
            batch_rows = []
            newly_visited: list[str] = []
            if sharded:
                for row in sheap.pop_global_batch(cfg.best_first_batch):
                    url = row["url"]
                    if url in visited:
                        continue
                    visited.add(url)
                    newly_visited.append(url)
                    batch_rows.append(
                        {"url": url, "depth": row["depth"],
                         "parent_url": row["parent_url"], "score": row["score"]}
                    )
            else:
                for _ in range(cfg.best_first_batch):
                    if not heap:
                        break
                    neg_score, depth, _, url, parent = heapq.heappop(heap)
                    if url in visited:
                        continue
                    visited.add(url)
                    newly_visited.append(url)
                    batch_rows.append(
                        {"url": url, "depth": depth, "parent_url": parent, "score": -neg_score}
                    )
            if not batch_rows:
                continue
            frontier = _frontier_table(batch_rows, batch_idx, cfg.num_seen_shards)
            self.store.write_epoch_table(
                "frontier", batch_idx, frontier, row_group_size=cfg.fetch_batch_size
            )
            ext, wall = self._run_epoch_pipeline(frontier, batch_idx)
            cand = ext.select_columns(
                ["frontier_rank", "url", "depth", "success", "links"]
            ).take_all()
            cand.sort(key=lambda r: r["frontier_rank"])
            push_buffer: list[dict] = []
            for row in cand:
                if not row["success"]:
                    continue
                self.pages_crawled += 1
                total_fetched += 1
                if self.pages_crawled >= cfg.max_pages:
                    break  # mid-batch stop (bff:233-238)
                next_depth = row["depth"] + 1
                if next_depth > cfg.max_depth:
                    continue
                if cfg.max_pages - self.pages_crawled <= 0:
                    continue
                for link in row["links"] or []:
                    if not link["internal"] and not cfg.include_external:
                        continue
                    norm = normalize_url_for_deep_crawl(link["href"], row["url"])
                    if not norm or norm in visited:
                        continue
                    if not _can_process(link["href"], next_depth, self.filter_chain):
                        continue
                    depths[norm] = next_depth
                    new_depth = depths.get(norm, next_depth)
                    score = self.scorer.score(norm) if self.scorer else 0.0
                    if sharded:
                        push_buffer.append(
                            {"url": norm, "host": host_of(norm), "score": score,
                             "depth": new_depth, "parent_url": row["url"]}
                        )
                    else:
                        heapq.heappush(heap, (-score, new_depth, seq, norm, row["url"]))
                    seq += 1
            if sharded and push_buffer:
                sheap.push_batch(push_buffer)
            self._write_seen_delta(newly_visited, batch_idx)
            self._write_metrics(ext, batch_idx, wall)
            self.store.write_manifest(
                {
                    "strategy": "best_first",
                    "epoch": batch_idx,
                    "pages_crawled": self.pages_crawled,
                    "num_seen_shards": cfg.num_seen_shards,
                    "bloom_generations": self.seen.generations(),
                    "deterministic": True,
                }
            )
            self._notify_epoch(batch_idx)
            batch_idx += 1
        wall_total = time.time() - t_start
        if sheap is not None:
            sheap.shutdown()
        if visited:
            self.seen.add(sorted(visited), [host_of(u) for u in sorted(visited)])
        return {
            "epochs": batch_idx,
            "pages_crawled": self.pages_crawled,
            "fetched": total_fetched,
            "seen_size": len(visited),
            "wall_s": wall_total,
            "urls_per_s": total_fetched / wall_total if wall_total > 0 else 0.0,
        }

    def _run_best_first_scale(self, seeds: list[str]) -> dict:
        """Scale-mode Best-First — the north-star shape at 10^10: a sharded
        priority frontier (per-shard heap actors + driver k-way merge,
        state/frontier_heap.py) feeding the SAME distributed discovery
        chain as BFS-scale.  Per round:

            pop global top-k (O(shards×k) driver rows)
              → pop-time visited via the sharded seen filter (bloom at
                scale — first-wins, reference bff:205-207 semantics)
              → fetch→extract→sink docs→flatten→canonicalize→filter→gate
              → candidate keys stream back in bounded chunks and PUSH into
                the heap shards (urls queued at most once; re-pushes of
                popped urls die at the next pop's seen check)

        The driver never holds more than max(best_first_batch × shards,
        seen_round_chunk) rows.  Ordering: (score desc, depth, url) — the
        url tiebreak documented at _run_best_first applies here too."""
        from ..state.frontier_heap import ShardedFrontierHeap

        cfg = self.config
        sheap = ShardedFrontierHeap(cfg.num_seen_shards)
        seed_rows = []
        for u in seeds:
            canon = normalize_url_for_deep_crawl(u, u)
            if canon and is_valid_frontier_url(canon):
                score = self.scorer.score(canon) if self.scorer else 0.0
                seed_rows.append(
                    {"url": canon, "host": host_of(canon), "score": score,
                     "depth": 0, "parent_url": None}
                )
        if seed_rows:
            sheap.push_batch(seed_rows)
        batch_idx = 0
        total_fetched = 0
        t_start = time.time()
        while self.pages_crawled < cfg.max_pages:
            if cfg.max_epochs is not None and batch_idx >= cfg.max_epochs:
                break
            pass_size = max(
                cfg.best_first_batch,
                min(
                    cfg.best_first_batch * cfg.best_first_rounds_per_pass,
                    cfg.max_pages - self.pages_crawled,
                ),
            )
            popped = sheap.pop_global_batch(pass_size)
            if not popped:
                break
            fresh = self.seen.check_and_add(
                [r["url"] for r in popped], [host_of(r["url"]) for r in popped]
            )
            rows = [r for r, f in zip(popped, fresh) if f]
            if not rows:
                continue
            frontier = _frontier_table(rows, batch_idx, cfg.num_seen_shards)
            input_dir = self._stage_frontier(frontier, batch_idx, group="frontier")
            t0 = time.time()
            cand = self._epoch_candidate_ds(input_dir, batch_idx)
            keys = cand.select_columns(["url", "host", "src_depth", "src_url", "score"])
            for b in keys.iter_batches(
                batch_size=cfg.seen_round_chunk, batch_format="pyarrow"
            ):
                if b.num_rows == 0:
                    continue
                sheap.push_batch(
                    [
                        {"url": u, "host": h, "score": float(sc),
                         "depth": int(d) + 1, "parent_url": p}
                        for u, h, sc, d, p in zip(
                            b.column("url").to_pylist(),
                            b.column("host").to_pylist(),
                            b.column("score").to_pylist(),
                            b.column("src_depth").to_pylist(),
                            b.column("src_url").to_pylist(),
                        )
                    ]
                )
            counters = ray.get(
                [sh.drain_counters.remote() for sh in self.politeness.shards]
            )
            fetched = sum(c["fetched"] for c in counters)
            self.pages_crawled += fetched
            total_fetched += fetched
            m = self._write_metrics_from_counters(counters, batch_idx, time.time() - t0)
            self.store.write_manifest(
                {
                    "strategy": "best_first",
                    "epoch": batch_idx,
                    "pages_crawled": self.pages_crawled,
                    "num_seen_shards": cfg.num_seen_shards,
                    "bloom_generations": self.seen.generations(),
                    "deterministic": False,
                }
            )
            self._notify_epoch(batch_idx)
            batch_idx += 1
        wall_total = time.time() - t_start
        sheap.shutdown()
        return {
            "epochs": batch_idx,
            "pages_crawled": self.pages_crawled,
            "fetched": total_fetched,
            "seen_size": self.seen.total_size(),
            "wall_s": wall_total,
            "urls_per_s": total_fetched / wall_total if wall_total > 0 else 0.0,
        }

    # -------------------------------------------------------------- dfs
    def _run_dfs(self, seeds: list[str]) -> dict:
        """Sequential DFS parity mode (dfs_strategy.py:27-111): LIFO stack,
        children pushed reversed so the first-discovered link is crawled
        next.  Inherently serial — provided for ordering parity, not scale
        (SURVEY.md §2.8)."""
        cfg = self.config
        stack: list[tuple[str, str | None, int]] = []
        visited: set[str] = set()
        for s in reversed(seeds):
            canon = normalize_url_for_deep_crawl(s, s)
            if canon and is_valid_frontier_url(canon):
                stack.append((canon, None, 0))
        transport = self.transport
        from ..state.politeness import RobotsGate

        robots = RobotsGate(self.robots_bodies)
        results = []
        t_start = time.time()
        while stack and self.pages_crawled < cfg.max_pages:
            url, parent, depth = stack.pop()
            host = host_of(url)
            if not robots.can_fetch(host, url):
                status, html = 403, ""
            else:
                status, html = transport.fetch(url)
            success = status == 200
            results.append(
                {"url": url, "parent_url": parent, "depth": depth, "status_code": status,
                 "success": success}
            )
            if not success:
                continue
            self.pages_crawled += 1
            next_depth = depth + 1
            if next_depth > cfg.max_depth:
                continue
            page = extract_page(html, url)
            links = page["internal_links"] + (
                page["external_links"] if cfg.include_external else []
            )
            discovered = []
            for link in links:
                norm = normalize_url_for_deep_crawl(link["href"], url)
                if not norm or norm in visited:
                    continue
                if not _can_process(link["href"], next_depth, self.filter_chain):
                    continue
                score = self.scorer.score(norm) if self.scorer else 0.0
                if score < cfg.score_threshold:
                    continue
                visited.add(norm)
                discovered.append((norm, url, next_depth))
            for item in reversed(discovered):
                stack.append(item)
        wall_total = time.time() - t_start
        self._dfs_results = results
        return {
            "epochs": 0,
            "pages_crawled": self.pages_crawled,
            "fetched": self.pages_crawled,
            "seen_size": len(visited),
            "wall_s": wall_total,
            "urls_per_s": self.pages_crawled / wall_total if wall_total > 0 else 0.0,
        }

    # ------------------------------------------------------------ outputs
    def docs_dataset(self):
        dirs = self.store.docs_dirs()
        if not dirs:
            return None
        # read_parquet treats LIST entries as files, not dirs — expand
        files = [
            os.path.join(d, f)
            for d in dirs
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        return ray.data.read_parquet(files)
