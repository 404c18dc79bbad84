"""Corpus generator invariants: determinism, span ground truth recovered by
the extractor (the span-sequence equality invariant of BASELINE.json
input_hint), link graph reachability."""

import pytest

from crawl4ai_ray.sources.corpus import (
    CorpusParams,
    SyntheticTransport,
    child_pages,
    golden_spans,
    page_status,
    page_url,
    parse_page_url,
    robots_map,
    synthesize_html,
)
from crawl4ai_ray.stages.extract import extract_page

PARAMS = CorpusParams(n_hosts=3, pages_per_host=40, seed=42)


def test_deterministic():
    assert synthesize_html(PARAMS, 1, 7) == synthesize_html(PARAMS, 1, 7)
    assert golden_spans(PARAMS, 1, 7) == golden_spans(PARAMS, 1, 7)


def test_url_roundtrip():
    for host_idx in range(PARAMS.n_hosts):
        for pid in (0, 1, 17, 39):
            url = page_url(PARAMS, host_idx, pid)
            assert parse_page_url(PARAMS, url) == (host_idx, pid)
    assert parse_page_url(PARAMS, "http://site0.test/p/9999") is None
    assert parse_page_url(PARAMS, "http://other.com/") is None
    # query/fragment variants resolve to the same page
    assert parse_page_url(PARAMS, "http://site0.test/p/3?utm_source=x") == (0, 3)


@pytest.mark.parametrize("host_idx,pid", [(0, 0), (0, 1), (1, 5), (2, 7), (0, 16), (1, 18), (2, 33)])
def test_span_sequence_equality(host_idx, pid):
    """Per-row span-sequence equality (kind, text, media_ref, order):
    extractor output over the rendered HTML == generator ground truth."""
    html = synthesize_html(PARAMS, host_idx, pid)
    url = page_url(PARAMS, host_idx, pid)
    got = extract_page(html, url)["spans"]
    expected = golden_spans(PARAMS, host_idx, pid)
    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got] == [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in expected
    ]


def test_extracted_links_match_children():
    html = synthesize_html(PARAMS, 0, 1)
    page = extract_page(html, page_url(PARAMS, 0, 1))
    hrefs = {l["href"] for l in page["internal_links"]}
    for c in child_pages(PARAMS, 0, 1):
        # tracking/fragment decoys must normalize back to the canonical page URL
        assert any(page_url(PARAMS, 0, c).split("#")[0].rstrip("/") in h for h in hrefs)


def test_transport_statuses():
    p = CorpusParams(n_hosts=2, pages_per_host=100, p_404=0.2, p_429=0.1, seed=1)
    t = SyntheticTransport(p)
    statuses = {t.fetch(page_url(p, 0, i))[0] for i in range(1, 100)}
    assert statuses >= {200, 404}
    assert t.fetch("http://site0.test/")[0] == 200  # root never fails
    assert t.fetch("http://nope.test/")[0] == 404


def test_robots_map():
    p = CorpusParams(n_hosts=4)
    r = robots_map(p)
    assert "Disallow: /private/" in r["site0.test"]
    assert "site1.test" not in r  # missing robots ⇒ allow-all
    assert "Allow" in r["site3.test"]


def test_heavy_host():
    p = CorpusParams(n_hosts=3, pages_per_host=10, heavy_factor=5)
    assert p.n_pages(0) == 50 and p.n_pages(1) == 10
