"""URL-normalizer unit vectors.

Cases derived from /root/reference/tests/test_normalize_url.py:6-80 (adjusted
where that test file is stale vs. the current reference implementation: the
fragment is dropped by default and no ValueError is raised for odd base URLs)
plus tracking-param / casing / trailing-slash / deep-crawl-variant vectors.
"""

import pytest

from crawl4ai_ray.urlnorm import (
    get_base_domain,
    host_of,
    is_external_url,
    is_valid_frontier_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)

GENERIC_VECTORS = [
    ("path/to/page.html", "http://example.com/base/", "http://example.com/base/path/to/page.html"),
    ("page.html", "http://example.com/base/", "http://example.com/base/page.html"),
    ("page.html", "http://example.com/base", "http://example.com/page.html"),
    ("http://another.com/page.html", "http://example.com/", "http://another.com/page.html"),
    ("  page.html  ", "http://example.com/", "http://example.com/page.html"),
    ("", "http://example.com/base/", None),
    (None, "http://example.com/base/", None),
    ("page.html?query=test", "http://example.com/", "http://example.com/page.html?query=test"),
    # fragment dropped by default (utils.py:2321)
    ("page.html#section", "http://example.com/", "http://example.com/page.html"),
    ("https://secure.example.com/page.html", "http://example.com/", "https://secure.example.com/page.html"),
    ("../otherpage.html", "http://example.com/base/current/", "http://example.com/base/otherpage.html"),
    ("/otherpage.html", "http://example.com/base/current/", "http://example.com/otherpage.html"),
    ("page.html", "http://example.com", "http://example.com/page.html"),
    ("?query=true", "http://example.com/page.html", "http://example.com/page.html?query=true"),
    ("./P02.xlsx", "http://example.com/a/b/c/t.shtml", "http://example.com/a/b/c/P02.xlsx"),
    ("path/file.html", "http://example.com:8080/base/", "http://example.com:8080/base/path/file.html"),
    ("path%20with%20spaces/file.html", "http://example.com/", "http://example.com/path%20with%20spaces/file.html"),
    # tracking params dropped, remaining keys lower-cased + sorted
    ("/p?utm_source=x&b=2&A=1", "http://example.com", "http://example.com/p?a=1&b=2"),
    ("/p?gclid=99&ref=abc&ref_src=t", "http://example.com", "http://example.com/p"),
    # uppercase netloc lowered
    ("http://EXAMPLE.com/Path/", "http://example.com/", "http://example.com/Path"),
    # root slash kept by generic variant
    ("/", "http://example.com", "http://example.com/"),
]


@pytest.mark.parametrize("href,base,expected", GENERIC_VECTORS)
def test_normalize_url_generic(href, base, expected):
    assert normalize_url(href, base) == expected


DEEP_VECTORS = [
    ("/a/b/", "http://example.com", "http://example.com/a/b"),
    ("/a/b#frag", "http://example.com", "http://example.com/a/b"),
    # deep-crawl variant strips even the root slash (path.rstrip('/'))
    ("/", "http://example.com", "http://example.com"),
    # tracking subset: utm_*, ref, fbclid — but NOT gclid (utils.py:2371)
    ("/p?utm_source=x&keep=1", "http://example.com", "http://example.com/p?keep=1"),
    ("/p?gclid=1", "http://example.com", "http://example.com/p?gclid=1"),
    # parse_qs drops blank values (quirk preserved)
    ("/p?a=&b=2", "http://example.com", "http://example.com/p?b=2"),
    # multi-value keys survive via doseq
    ("/p?a=1&a=2", "http://example.com", "http://example.com/p?a=1&a=2"),
    ("HTTP://WWW.Example.COM/Page", "http://example.com", "http://www.example.com/Page"),
    (None, "http://example.com", None),
    ("", "http://example.com", None),
]


@pytest.mark.parametrize("href,base,expected", DEEP_VECTORS)
def test_normalize_url_deep_crawl(href, base, expected):
    assert normalize_url_for_deep_crawl(href, base) == expected


def test_preserve_https():
    out = normalize_url_for_deep_crawl(
        "http://example.com/x", "https://example.com/", preserve_https=True,
        original_scheme="https",
    )
    assert out == "https://example.com/x"
    # protocol-relative URLs follow the base scheme, not the preserve flag
    out = normalize_url_for_deep_crawl(
        "//example.com/x", "https://example.com/", preserve_https=True,
        original_scheme="https",
    )
    assert out == "https://example.com/x"


def test_get_base_domain():
    assert get_base_domain("http://www.example.com/x") == "example.com"
    assert get_base_domain("http://sub.example.co.uk/x") == "example.co.uk"
    assert get_base_domain("http://example.com:8080/") == "example.com"
    assert get_base_domain("http://a.b.site3.test/") == "site3.test"
    assert get_base_domain("not a url") == ""


def test_is_external_url():
    assert is_external_url("mailto:x@y.com", "example.com")
    assert is_external_url("javascript:void(0)", "example.com")
    assert not is_external_url("/relative", "example.com")
    assert not is_external_url("http://www.example.com/x", "example.com")
    assert is_external_url("http://other.com/x", "example.com")
    # suffix-match quirk preserved: notexample.com "ends with" example.com
    assert not is_external_url("http://notexample.com/x", "example.com")


def test_validity_gate():
    assert is_valid_frontier_url("http://example.com/x")
    assert not is_valid_frontier_url("ftp://example.com/x")
    assert not is_valid_frontier_url("http://localhost/x")  # no dot
    assert not is_valid_frontier_url("javascript:void(0)")
    assert not is_valid_frontier_url("/relative/only")


def test_host_of():
    assert host_of("http://Example.com:8080/x") == "example.com:8080"
