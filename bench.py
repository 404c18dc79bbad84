#!/usr/bin/env python
"""Benchmark harness.

Headline: the crawl engine's scale path (bloom-only URL-seen, distributed
discovery, no driver fold) over a deterministic synthetic multi-host corpus
with a heavy host — reporting URLs fetched+extracted per second (the
BASELINE.json metric).  Plus per-query timings over $GRAFT_SF_DIR.

Usage:
    python bench.py                  # full bench (crawl + queries), one JSON line
    python bench.py --scaling        # headline at num_cpus=8 and 32 in fresh
                                     # processes → throughputs + efficiency
    python bench.py --headline-only  # crawl only (used by --scaling children)

Owns its Ray session (the only scripts allowed to: bench, CLI, test fixture).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time


def crawl_headline(num_cpus: int, scale: float) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from crawl4ai_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawl4ai_ray.sources.corpus import CorpusParams, SyntheticTransport, robots_map

    # ~42k pages at sf=0.1 (scale multiplies pages per host); heavy host 0
    params = CorpusParams(
        n_hosts=32,
        pages_per_host=max(40, int(12000 * scale)),
        heavy_factor=4,
        branch=8,
        extra_links=3,
        seed=42,
        private_every=23,
        n_paras_min=6,
        n_paras_max=14,
        words_min=20,
        words_max=60,
    )
    cfg = CrawlConfig(
        max_depth=12,
        num_seen_shards=max(8, num_cpus // 2),
        num_politeness_shards=max(4, num_cpus // 4),
        fetch_batch_size=256,
        extract_batch_size=256,
        deterministic=False,   # scale path: distributed discovery
        exact_seen=False,      # bloom-only (FP budget p=0.01)
        seen_capacity_per_shard=2_000_000,
        base_delay=(0.0, 0.0),
    )
    with tempfile.TemporaryDirectory(prefix="bench_crawl_") as ckpt:
        engine = CrawlEngine(
            SyntheticTransport(params), cfg, ckpt, robots_bodies=robots_map(params)
        )
        t0 = time.time()
        summary = engine.run(params.seeds())
        wall = time.time() - t0
    ray.shutdown()
    return {
        "wall_s": round(wall, 3),
        "fetched": summary["fetched"],
        "epochs": summary["epochs"],
        "urls_per_s": round(summary["fetched"] / wall, 2) if wall > 0 else 0.0,
    }


QUERY_NAMES = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "top10_orders",
    "events_by_type_day",
    "user_session_stats",
    "dedup_exact",
    "token_counts",
    "quality_scores",
    "fingerprint_md5",
    "simhash_docs",
    "minhash_neardup_pairs",
    "knn_cosine_top10",
    "embedding_neardup",
    "spans_flat",
]


def run_queries(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from crawl4ai_ray.pipelines.queries import QUERIES

    timings = {}
    for name in QUERY_NAMES:
        t0 = time.time()
        result = QUERIES[name](sf_dir)
        # consume datasets fully (count() executes the pipeline)
        if hasattr(result, "count"):
            result.count()
        timings[name] = round(time.time() - t0, 3)
    ray.shutdown()
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    args = ap.parse_args()

    sf = 0.1
    for tok in args.sf_dir.rstrip("/").split("/"):
        if tok.startswith("sf"):
            try:
                sf = float(tok[2:])
            except ValueError:
                pass

    if args.scaling:
        results = {}
        for n in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--headline-only", "--num-cpus", str(n),
                 "--sf-dir", args.sf_dir],
                capture_output=True, text=True, check=True,
            )
            results[n] = json.loads(out.stdout.strip().splitlines()[-1])
        thr8, thr32 = results[8]["urls_per_s"], results[32]["urls_per_s"]
        eff = round(thr32 / (4 * thr8), 3) if thr8 else 0.0
        print(json.dumps({
            "metric": "crawl_scaling_efficiency_8_to_32_cpus",
            "value": eff,
            "unit": "ratio",
            "throughput_8cpu_urls_per_s": thr8,
            "throughput_32cpu_urls_per_s": thr32,
            "wall_8cpu_s": results[8]["value"],
            "wall_32cpu_s": results[32]["value"],
            "pages": results[32]["fetched"],
            "sf": sf,
            "num_cpus": [8, 32],
        }))
        return

    headline = crawl_headline(args.num_cpus, sf)
    payload = {
        "metric": "crawl_fetch_extract_wall_seconds",
        "value": headline["wall_s"],
        "unit": "sec",
        "urls_per_s": headline["urls_per_s"],
        "fetched": headline["fetched"],
        "epochs": headline["epochs"],
        "sf": sf,
        "num_cpus": args.num_cpus,
    }
    if not args.headline_only:
        payload["queries"] = run_queries(args.sf_dir, args.num_cpus)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
