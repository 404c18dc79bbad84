"""Golden oracle: a direct sequential Python implementation of the reference
batch-BFS crawl semantics (/root/reference/crawl4ai/deep_crawling/
bfs_strategy.py:155-227 + link_discovery :81-152), run against the synthetic
corpus.  The distributed engine must reproduce this oracle's per-epoch URL
sets, final URL-seen set, and per-URL (depth, parent) exactly.

Deterministic merge rule (SURVEY.md §7.4 item 1): results within a level are
processed in frontier order (the order URLs entered the level), and each
page's links in document first-wins order — matching what the reference does
modulo its nondeterministic completion-order iteration.
"""

from __future__ import annotations

import math

from crawl4ai_ray.stages.extract import extract_page
from crawl4ai_ray.state.politeness import RobotsGate
from crawl4ai_ray.urlnorm import (
    host_of,
    is_valid_frontier_url,
    normalize_url_for_deep_crawl,
)

INF = math.inf


def _can_process(url: str, depth: int, filter_chain) -> bool:
    if not is_valid_frontier_url(url):
        return False
    if depth != 0 and filter_chain is not None and not filter_chain.apply(url):
        return False
    return True


def oracle_bfs(
    transport,
    robots_bodies,
    seeds,
    max_depth,
    max_pages=INF,
    filter_chain=None,
    scorer=None,
    score_threshold=-INF,
    include_external=False,
):
    """Returns (results, visited): results rows have url/depth/parent_url/
    status_code/success/epoch/rank_in_epoch."""
    robots = RobotsGate(robots_bodies)
    visited: set[str] = set()
    current: list[tuple[str, str | None]] = []
    depths: dict[str, int] = {}
    for s in seeds:
        canon = normalize_url_for_deep_crawl(s, s)
        if canon and is_valid_frontier_url(canon):
            current.append((canon, None))
            depths[canon] = 0
    results: list[dict] = []
    pages_crawled = 0
    epoch = 0
    while current:
        if pages_crawled >= max_pages:
            break
        next_level: list[tuple[str, str | None]] = []
        for rank, (url, parent) in enumerate(current):
            host = host_of(url)
            if not robots.can_fetch(host, url):
                status, html = 403, ""
            else:
                status, html = transport.fetch(url)
            success = status == 200
            depth = depths.get(url, 0)
            results.append(
                {
                    "url": url,
                    "depth": depth,
                    "parent_url": parent,
                    "status_code": status,
                    "success": success,
                    "epoch": epoch,
                    "rank_in_epoch": rank,
                }
            )
            if not success:
                continue
            pages_crawled += 1
            # ---- link_discovery (bfs_strategy.py:81-152) ----
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            remaining = max_pages - pages_crawled
            if remaining <= 0:
                continue
            page = extract_page(html, url)
            links = list(page["internal_links"])
            if include_external:
                links += page["external_links"]
            valid: list[tuple[str, float]] = []
            for link in links:
                href = link["href"]
                norm = normalize_url_for_deep_crawl(href, url)
                if norm in visited:
                    continue
                if not _can_process(href, next_depth, filter_chain):
                    continue
                score = scorer.score(norm) if scorer else 0.0
                if score < score_threshold:
                    continue
                visited.add(norm)
                valid.append((norm, score))
            if len(valid) > remaining:
                if scorer:
                    valid.sort(key=lambda x: x[1], reverse=True)
                valid = valid[: int(remaining)]
            for u, s in valid:
                next_level.append((u, url))
                depths[u] = next_depth
        current = next_level
        epoch += 1
    return results, visited


def oracle_best_first(
    transport,
    robots_bodies,
    seeds,
    max_depth,
    max_pages=INF,
    scorer=None,
    filter_chain=None,
    include_external=False,
    batch_size=10,
):
    """Sequential oracle for Best-First (bff_strategy.py:139-269): global
    priority queue (-score, depth, seq), visited-at-pop, NO score threshold
    in link_discovery, mid-batch stop at max_pages; batch results processed
    in batch order (our deterministic merge rule)."""
    import heapq

    robots = RobotsGate(robots_bodies)
    heap = []
    seq = 0
    visited = set()
    depths = {}
    for s in seeds:
        canon = normalize_url_for_deep_crawl(s, s)
        if canon and is_valid_frontier_url(canon):
            score = scorer.score(canon) if scorer else 0.0
            heapq.heappush(heap, (-score, 0, seq, canon, None))
            depths[canon] = 0
            seq += 1
    results = []
    pages_crawled = 0
    batch_idx = 0
    while heap and pages_crawled < max_pages:
        batch = []
        for _ in range(batch_size):
            if not heap:
                break
            neg, depth, _, url, parent = heapq.heappop(heap)
            if url in visited:
                continue
            visited.add(url)
            batch.append((url, depth, parent))
        if not batch:
            continue
        stop = False
        for rank, (url, depth, parent) in enumerate(batch):
            host = host_of(url)
            if not robots.can_fetch(host, url):
                status, html = 403, ""
            else:
                status, html = transport.fetch(url)
            success = status == 200
            results.append(
                {"url": url, "depth": depth, "parent_url": parent,
                 "status_code": status, "success": success, "epoch": batch_idx,
                 "rank_in_epoch": rank}
            )
            if not success:
                continue
            pages_crawled += 1
            if pages_crawled >= max_pages:
                stop = True
                break
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            if max_pages - pages_crawled <= 0:
                continue
            page = extract_page(html, url)
            links = list(page["internal_links"])
            if include_external:
                links += page["external_links"]
            for link in links:
                norm = normalize_url_for_deep_crawl(link["href"], url)
                if not norm or norm in visited:
                    continue
                if not _can_process(link["href"], next_depth, filter_chain):
                    continue
                depths[norm] = next_depth
                score = scorer.score(norm) if scorer else 0.0
                heapq.heappush(heap, (-score, next_depth, seq, norm, url))
                seq += 1
        batch_idx += 1
        if stop:
            break
    return results, visited
