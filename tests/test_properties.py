"""Property-based robustness tests (hypothesis): the normalizers must never
raise on arbitrary href/base inputs and must be idempotent on their own
output; bloom filters never report false negatives."""

from hypothesis import given, settings, strategies as st

from crawl4ai_ray.state.bloom import BloomFilter
from crawl4ai_ray.urlnorm import (
    host_of,
    is_valid_frontier_url,
    normalize_url,
    normalize_url_for_deep_crawl,
)

url_chars = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=60,
)
bases = st.sampled_from(
    [
        "http://example.com",
        "http://example.com/",
        "https://sub.example.co.uk/a/b",
        "http://example.com:8080/x/y/",
    ]
)


@settings(max_examples=300, deadline=None)
@given(href=url_chars, base=bases)
def test_normalizers_total_and_idempotent(href, base):
    try:
        out = normalize_url_for_deep_crawl(href, base)
    except ValueError:
        return  # urllib rejects some ports/IPv6 forms; raising is fine, crashing isn't
    if out is None:
        return
    assert isinstance(out, str)
    if is_valid_frontier_url(out):
        try:
            again = normalize_url_for_deep_crawl(out, out)
        except ValueError:
            return
        # canonical form is a fixed point
        assert normalize_url_for_deep_crawl(again, again) == again
        assert isinstance(host_of(out), str)


@settings(max_examples=200, deadline=None)
@given(href=url_chars, base=bases)
def test_generic_normalizer_total(href, base):
    try:
        out = normalize_url(href, base)
    except ValueError:
        return
    assert out is None or isinstance(out, str)


@settings(max_examples=50, deadline=None)
@given(keys=st.lists(st.text(max_size=30), min_size=1, max_size=200))
def test_bloom_never_false_negative(keys):
    bf = BloomFilter(capacity=1000, error_rate=0.01)
    bf.add_batch(keys)
    assert bf.contains_batch(keys).all()
