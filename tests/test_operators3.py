"""Tests for wave 3: seeder (sitemap recursion, filtering, BM25 ranking),
adaptive crawler (confidence/stop/digest), link scoring + head join."""

import pytest

from crawl4ai_ray.pipelines.adaptive import (
    AdaptiveConfig,
    AdaptiveCrawler,
    tokenize,
)
from crawl4ai_ray.sources.corpus import CorpusParams, SyntheticTransport
from crawl4ai_ray.sources.seeder import (
    SeederStage,
    SyntheticSitemapTransport,
    parse_sitemap,
    seed_urls,
)
from crawl4ai_ray.stages.linkjoin import (
    join_head_data,
    link_intrinsic_score,
    total_link_score,
)

PARAMS = CorpusParams(n_hosts=3, pages_per_host=40, seed=42)


def test_parse_sitemap():
    urls, subs = parse_sitemap(
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://a.test/p/1</loc></url><url><loc>http://a.test/p/2</loc></url></urlset>"
    )
    assert urls == ["http://a.test/p/1", "http://a.test/p/2"] and subs == []
    urls, subs = parse_sitemap(
        "<sitemapindex><sitemap><loc>http://a.test/sitemap_0.xml</loc></sitemap></sitemapindex>"
    )
    assert urls == [] and subs == ["http://a.test/sitemap_0.xml"]
    assert parse_sitemap("not xml") == ([], [])


def test_sitemap_transport_chunks():
    big = CorpusParams(n_hosts=1, pages_per_host=1200, seed=1)
    t = SyntheticSitemapTransport(big, chunk=500)
    xml = t.fetch_sitemap("http://site0.test/sitemap.xml")
    urls, subs = parse_sitemap(xml)
    assert not urls and len(subs) == 3  # 1200 pages → 3 chunked sub-sitemaps
    all_urls = []
    for s in subs:
        u, _ = parse_sitemap(t.fetch_sitemap(s))
        all_urls.extend(u)
    assert len(all_urls) == 1200


def test_seed_urls_pipeline(ray_session):
    t = SyntheticSitemapTransport(PARAMS)
    tbl = seed_urls(["site0.test", "site1.test"], t, pattern="*/p/*", max_urls=30)
    assert tbl.num_rows == 30
    urls = tbl.column("url").to_pylist()
    assert all("/p/" in u for u in urls)
    assert urls == sorted(urls)


def test_seed_urls_bm25_ranked(ray_session):
    t = SyntheticSitemapTransport(PARAMS)
    tbl = seed_urls(["site0.test"], t, query="synthetic page", max_urls=10)
    assert tbl.num_rows == 10
    assert "relevance_score" in tbl.column_names
    scores = tbl.column("relevance_score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    assert tbl.column("status").to_pylist() == ["valid"] * 10


def test_adaptive_tokenize():
    assert tokenize("Hello, world! a of the big-data") == ["Hello", "world", "the", "big", "data"]


def test_adaptive_digest(ray_session):
    crawler = AdaptiveCrawler(
        SyntheticTransport(PARAMS),
        query="crawl frontier data",
        config=AdaptiveConfig(max_pages=8, top_k_links=3, confidence_threshold=0.95),
    )
    out = crawler.digest("http://site0.test/")
    assert 0 < out["pages_crawled"] <= 8
    assert out["crawl_order"][0] == "http://site0.test"
    assert set(out["metrics"]) >= {"coverage", "consistency", "saturation"}
    assert 0.0 <= out["confidence"] <= 1.0
    # deterministic
    crawler2 = AdaptiveCrawler(
        SyntheticTransport(PARAMS),
        query="crawl frontier data",
        config=AdaptiveConfig(max_pages=8, top_k_links=3, confidence_threshold=0.95),
    )
    out2 = crawler2.digest("http://site0.test/")
    assert out2["crawl_order"] == out["crawl_order"]
    # state is JSON-serializable (reference resume contract)
    import json

    json.dumps(out["state"])


def test_adaptive_stops_on_confidence(ray_session):
    crawler = AdaptiveCrawler(
        SyntheticTransport(PARAMS), query="data",
        config=AdaptiveConfig(max_pages=100, confidence_threshold=0.1),
    )
    out = crawler.digest("http://site0.test/")
    assert out["pages_crawled"] <= 4  # stopped early, not by page cap


def test_link_intrinsic_score():
    ctx = {"terms": {"install", "guide"}, "is_docs_site": True}
    hi = link_intrinsic_score(
        "Installation guide here", "https://x.com/docs/install",
        title_attr="Install guide", class_attr="nav-main", page_context=ctx,
    )
    lo = link_intrinsic_score(
        "click here", "http://x.com/a/b/c/d/e/f/track/x",
        class_attr="ad-banner", rel_attr="nofollow", page_context={},
    )
    assert hi > 6.0 > lo
    assert lo >= 0.0
    assert total_link_score(10.0, 1.0) == pytest.approx(10.0)
    assert total_link_score(5.0, 0.0) == pytest.approx(3.5)


def test_join_head_data(ray_session):
    import ray.data

    links = ray.data.from_items(
        [{"href": "http://a.test/1"}, {"href": "http://a.test/2"}]
    )
    lookup = {"http://a.test/1": {"title": "T1", "description": "D1"}}
    out = {r["href"]: r for r in join_head_data(links, lookup).take_all()}
    assert out["http://a.test/1"]["head_title"] == "T1"
    assert out["http://a.test/1"]["head_found"]
    assert not out["http://a.test/2"]["head_found"]
