"""Table-driven unit vectors for frontier filters and scorers (the reference's
own test style: tests/general/test_deep_crawl_filters.py / _scorers.py), plus
an exec-the-reference-source parity fuzz when /root/reference is present."""

import ast
import os

import pytest

from crawl4ai_ray.functions.filters import (
    ContentTypeFilter,
    DomainFilter,
    FilterChain,
    NonsenseURLFilter,
    URLPatternFilter,
)
from crawl4ai_ray.functions.scorers import (
    CompositeScorer,
    ContentTypeScorer,
    DomainAuthorityScorer,
    FreshnessScorer,
    KeywordRelevanceScorer,
    PathDepthScorer,
)

PATTERN_CASES = [
    (["*.html"], "http://x.com/a/page.html", True),
    (["*.html"], "http://x.com/a/page.php", False),
    (["*.html"], "http://x.com/page.html?q=1", True),
    (["/api/*"], "http://x.com/api/v1", False),  # prefix matches path-with-host string, not URL path
    (["*://x.com/api/*"], "http://x.com/api/v1", True),
    (["http://x.com/api/*"], "http://x.com/api", True),
    (["http://x.com/api/*"], "http://x.com/apiv2", False),  # path boundary
    (["^https?://docs"], "https://docs.python.org/3/", True),
    (["^https?://docs"], "https://blog.python.org/3/", False),
    # quirk preserved: {a,b} expands to (a|b) BEFORE fnmatch.translate, which
    # then escapes the parens — so brace-globs never match (filters.py:204-216)
    (["*{blog,news}*"], "http://x.com/blog/post", False),
    (["*{blog,news}*"], "http://x.com/shop/item", False),
    # same escape quirk hits ** → .* (the dot gets escaped by translate)
    (["**/2023/**"], "http://x.com/a/2023/b", False),
    (["*2023*"], "http://x.com/a/2023/b", True),
]


@pytest.mark.parametrize("patterns,url,expected", PATTERN_CASES)
def test_url_pattern_filter(patterns, url, expected):
    assert URLPatternFilter(patterns).apply(url) == expected
    assert URLPatternFilter(patterns, reverse=True).apply(url) == (not expected)


CONTENT_TYPE_CASES = [
    (["text/html"], "http://x.com/page.html", True),
    (["text/html"], "http://x.com/pic.jpg", False),
    (["text/html"], "http://x.com/no-extension", True),  # extensionless passes
    (["text/html"], "http://x.com/", True),
    (["image"], "http://x.com/pic.jpg", True),
    (["image"], "http://x.com/doc.pdf", False),
    (["application/pdf"], "http://x.com/doc.pdf", True),
]


@pytest.mark.parametrize("allowed,url,expected", CONTENT_TYPE_CASES)
def test_content_type_filter(allowed, url, expected):
    assert ContentTypeFilter(allowed).apply(url) == expected


DOMAIN_CASES = [
    (dict(allowed_domains=["x.com"]), "http://x.com/a", True),
    (dict(allowed_domains=["x.com"]), "http://sub.x.com/a", True),
    (dict(allowed_domains=["x.com"]), "http://y.com/a", False),
    (dict(blocked_domains=["bad.x.com"]), "http://bad.x.com/a", False),
    (dict(blocked_domains=["bad.x.com"]), "http://x.com/a", True),
    (dict(), "http://anything.com/a", True),
]


@pytest.mark.parametrize("kwargs,url,expected", DOMAIN_CASES)
def test_domain_filter(kwargs, url, expected):
    assert DomainFilter(**kwargs).apply(url) == expected


def test_filter_chain_all_must_pass():
    chain = FilterChain([URLPatternFilter(["*.html"]), DomainFilter(allowed_domains=["x.com"])])
    assert chain.apply("http://x.com/a.html")
    assert not chain.apply("http://y.com/a.html")
    assert not chain.apply("http://x.com/a.php")
    mask = chain.apply_batch(
        ["http://x.com/a.html", "http://y.com/a.html", "http://x.com/b.html"]
    )
    assert mask.tolist() == [True, False, True]


def test_nonsense_filter():
    f = NonsenseURLFilter()
    assert not f.apply("http://x.com/robots.txt")
    assert not f.apply("http://x.com/sitemap.xml")
    assert not f.apply("http://x.com/wp-admin/options.php")
    assert not f.apply("http://x.com/.git/config")
    assert f.apply("http://x.com/articles/2023/hello")


SCORER_CASES = [
    (KeywordRelevanceScorer(["blog", "python"]), "http://x.com/blog/python-tips", 1.0),
    (KeywordRelevanceScorer(["blog", "python"]), "http://x.com/blog/rust", 0.5),
    (KeywordRelevanceScorer(["blog", "python"]), "http://x.com/shop", 0.0),
    (PathDepthScorer(1), "http://x.com/a", 1.0),
    (PathDepthScorer(1), "http://x.com/a/b", 0.5),
    (PathDepthScorer(1), "http://x.com/a/b/c", 0.3333333333333333),
    (PathDepthScorer(1), "http://x.com", 0.5),
    (ContentTypeScorer({".html$": 1.0, ".pdf$": 0.8}), "http://x.com/a.html", 1.0),
    (ContentTypeScorer({".html$": 1.0, ".pdf$": 0.8}), "http://x.com/a.pdf", 0.8),
    (ContentTypeScorer({".html$": 1.0}), "http://x.com/a.txt", 0.0),
    (FreshnessScorer(current_year=2024), "http://x.com/blog/2024/post", 1.0),
    (FreshnessScorer(current_year=2024), "http://x.com/blog/2021/post", 0.7),
    (FreshnessScorer(current_year=2024), "http://x.com/blog/post", 0.5),
    (DomainAuthorityScorer({"x.com": 0.9}), "http://x.com/a", 0.9),
    (DomainAuthorityScorer({"x.com": 0.9}), "http://y.com/a", 0.5),
]


@pytest.mark.parametrize("scorer,url,expected", SCORER_CASES)
def test_scorers(scorer, url, expected):
    assert scorer.score(url) == pytest.approx(expected, abs=1e-9)


def test_composite_normalizes():
    comp = CompositeScorer(
        [KeywordRelevanceScorer(["blog"]), PathDepthScorer(1)], normalize=True
    )
    got = comp.score("http://x.com/blog")
    assert got == pytest.approx((1.0 + 1.0) / 2, abs=1e-6)


REF = "/root/reference/crawl4ai/deep_crawling"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_parity_vs_reference_source():
    """Exec the reference filter/scorer modules in isolation and compare
    outputs exactly over a URL grid (spec-level parity evidence)."""
    src_f = open(f"{REF}/filters.py").read().replace(
        "from ..utils import HeadPeekr", "HeadPeekr = None"
    )
    nsf: dict = {}
    exec(compile(src_f, "ref_filters", "exec"), nsf)
    nss: dict = {}
    exec(compile(open(f"{REF}/scorers.py").read(), "ref_scorers", "exec"), nss)

    urls = [
        f"{scheme}://{h}{p}"
        for scheme in ("http", "https")
        for h in ("example.com", "docs.python.org", "sub.x.co.uk")
        for p in (
            "", "/", "/a", "/a/b/c", "/api/v2", "/apiv2/x", "/foo/bar.html",
            "/x.pdf", "/img/pic.jpg", "/blog/2023/05/01/post", "/a/b/c/d/e/f",
            "/page.aspx;jsessionid=1", "/news/2024_01_02",
        )
    ]
    for pats in (["*.html"], ["/foo/*"], ["^https?://docs"], ["*.{html,php}"], ["**/blog/**"]):
        ref = nsf["URLPatternFilter"](pats)
        ours = URLPatternFilter(pats)
        for u in urls:
            assert ref.apply(u) == ours.apply(u), (pats, u)
    for allowed in (["text/html"], ["image"], ["application/pdf"]):
        ref = nsf["ContentTypeFilter"](allowed)
        ours = ContentTypeFilter(allowed)
        for u in urls:
            assert ref.apply(u) == ours.apply(u), (allowed, u)
    pairs = [
        ("KeywordRelevanceScorer", KeywordRelevanceScorer, ((["blog", "python", "2023"],), dict(weight=0.7))),
        ("PathDepthScorer", PathDepthScorer, ((2,), dict(weight=1.3))),
        ("FreshnessScorer", FreshnessScorer, ((), dict(weight=1.1))),
        ("DomainAuthorityScorer", DomainAuthorityScorer, (({"docs.python.org": 1.0, "example.com": 0.6},), dict(weight=0.8))),
    ]
    refs, ours_list = [], []
    for name, cls, (args, kwargs) in pairs:
        refs.append(nss[name](*args, **kwargs))
        ours_list.append(cls(*args, **kwargs))
        for u in urls:
            assert refs[-1].score(u) == ours_list[-1].score(u), (name, u)
    ref_comp = nss["CompositeScorer"](refs)
    our_comp = CompositeScorer(ours_list)
    for u in urls:
        assert ref_comp.score(u) == our_comp.score(u), u


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_head_filters_parity_vs_reference_source():
    """SEOFilter + ContentRelevanceFilter: exec the reference module with
    HeadPeekr stubbed to serve fixture heads (network is the only thing
    replaced; scoring math runs the reference's own code) and compare
    decisions exactly over a head-HTML × URL grid."""
    import asyncio

    from crawl4ai_ray.functions.head_filters import (
        ContentRelevanceFilter as OurRelevance,
        SEOFilter as OurSEO,
        extract_meta_tags,
        get_title,
    )

    heads = {
        "http://x.test/good": (
            "<head><title>A perfectly sized SEO title for testing pur</title>"
            '<meta name="description" content="'
            + "d" * 150
            + '">'
            '<meta name="keywords" content="alpha,beta">'
            '<meta name="robots" content="index,follow">'
            '<script type="application/ld+json">{}</script></head>'
        ),
        "http://x.test/noindex?q=1": (
            "<head><title>tiny</title>"
            '<meta name="robots" content="noindex"></head>'
        ),
        "http://x.test/2024_archive/post": (
            "<head><title>Archive post about alpha and beta things he</title>"
            '<meta name="description" content="alpha beta alpha beta gamma">'
            "</head>"
        ),
        "http://x.test/nohead": "",
        "http://x.test/rel": (
            "<head><title>stream processing engines compared</title>"
            '<meta name="description" content="a stream batch merge study">'
            '<meta name="keywords" content="stream,batch"></head>'
        ),
    }

    _gt, _emt = get_title, extract_meta_tags

    class StubPeekr:
        @staticmethod
        async def peek_html(url, timeout=0.3):
            return heads.get(url) or None

        get_title = staticmethod(_gt)
        extract_meta_tags = staticmethod(_emt)

    src = open(f"{REF}/filters.py").read().replace(
        "from ..utils import HeadPeekr", "HeadPeekr = None"
    )
    ns: dict = {}
    exec(compile(src, "ref_filters", "exec"), ns)
    ns["HeadPeekr"] = StubPeekr
    # rebind the global the exec'd classes see
    ns["ContentRelevanceFilter"].__init__.__globals__["HeadPeekr"] = StubPeekr

    urls = list(heads)
    peek = lambda u: heads.get(u) or None
    for kw in (None, ["alpha", "beta"]):
        for thr in (0.2, 0.45, 0.65):
            ref = ns["SEOFilter"](threshold=thr, keywords=kw)
            ours = OurSEO(peek, threshold=thr, keywords=kw)
            for u in urls:
                assert asyncio.run(ref.apply(u)) == ours.apply(u), ("seo", kw, thr, u)
    for q in ("stream batch", ["alpha", "beta"], "absent terms"):
        for thr in (0.1, 1.0, 2.5):
            ref = ns["ContentRelevanceFilter"](query=q, threshold=thr)
            ours = OurRelevance(q, thr, peek)
            for u in urls:
                assert asyncio.run(ref.apply(u)) == ours.apply(u), ("rel", q, thr, u)


def test_head_meta_extraction_vectors():
    from crawl4ai_ray.functions.head_filters import extract_meta_tags, get_title

    head = (
        "<head><title>T1</title>"
        '<meta name="description" content="D">'
        '<meta property="og:x" content="P">'
        '<meta content="orphan">'
        "<meta name='q'></head>"
    )
    assert get_title(head) == "T1"
    assert extract_meta_tags(head) == {"description": "D", "og:x": "P"}
    assert get_title("<p>no head</p>") is None
