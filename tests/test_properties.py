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


# ------------------------------------------------------------ cuckoo filter
@settings(max_examples=80, deadline=None)
@given(
    ops=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=200)),
        max_size=120,
    )
)
def test_cuckoo_never_false_negative_under_add_delete(ops):
    """Invariant: a key in the reference SET is always reported present.
    The filter has set semantics (add_batch dedups, delete removes the
    key entirely — see the CuckooFilter docstring), so the model is a
    set, not a multiset."""
    from crawl4ai_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(capacity=512)
    live: set[str] = set()
    for is_add, kid in ops:
        key = f"key-{kid}"
        if is_add:
            cf.add_batch([key])
            live.add(key)
        elif key in live:
            removed = cf.delete_batch([key])
            assert removed[0]  # present keys always delete successfully
            live.discard(key)
    if live:
        assert cf.contains_batch(sorted(live)).all()


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
        max_size=200,
    )
)
def test_repetition_stats_invariants(text):
    """Totality + range invariants on arbitrary unicode text."""
    from crawl4ai_ray.functions.textstats import repetition_stats, tokens

    s = repetition_stats(text)
    assert s["n_tokens"] == len(tokens(text.lower()))
    for k in ("distinct_ratio", "top_token_frac", "top_bigram_frac"):
        assert 0.0 <= s[k] <= 1.0, (k, s)
    if s["n_tokens"] == 0:
        assert s["repetitive"] is False
    if s["n_tokens"] == 1:
        assert s["distinct_ratio"] == 1.0 and s["top_bigram_frac"] == 0.0
