"""Head-section URL filters — parity with the reference's
``ContentRelevanceFilter`` (BM25 over head fields,
/root/reference/crawl4ai/deep_crawling/filters.py:509-577) and ``SEOFilter``
(weighted head-quality score, filters.py:580-698), plus the HeadPeekr
helpers they consume (utils.py:3063-3118).

The reference peeks heads over the network (async aiohttp); here the head
source is a pluggable ``head_fetcher(url) -> str | None`` so the same filter
drops into a FilterChain against the synthetic transport (tests/bench) or a
real HTTP peeker on a deployment.  Filters stay sync — inside a Ray actor
batch the fetcher can fan out however it likes.

Ray mapping: construct the filter inside the stage (compiled patterns per
worker), put it in a ``FilterChain`` via ``CrawlConfig.filter_factory``, or
use ``apply_batch`` directly in a map_batches gate.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from urllib.parse import urlparse

from .filters import URLFilter

_META_RE = re.compile(r"<meta[^>]+>")
_NAME_RE = re.compile(r'name=["\'](.*?)["\']')
_PROPERTY_RE = re.compile(r'property=["\'](.*?)["\']')
_CONTENT_RE = re.compile(r'content=["\'](.*?)["\']')
_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_LDJSON_RE = re.compile(r'<script[^>]+type=["\']application/ld\+json')


def get_title(head_content: str) -> str | None:
    """Reference HeadPeekr.get_title (utils.py:3116-3118)."""
    m = _TITLE_RE.search(head_content)
    return m.group(1) if m else None


def extract_meta_tags(head_content: str) -> dict:
    """Reference HeadPeekr.extract_meta_tags (utils.py:3097-3114): meta tags
    with name= or property= and a content= (document order; canonical is a
    <link>, so — like the reference — it never lands here)."""
    meta: dict[str, str] = {}
    for m in _META_RE.finditer(head_content):
        tag = m.group(0)
        name = _NAME_RE.search(tag)
        prop = _PROPERTY_RE.search(tag)
        content = _CONTENT_RE.search(tag)
        if content and (name or prop):
            meta[(name or prop).group(1)] = content.group(1)
    return meta


def head_fetcher_from_transport(transport):
    """Adapter: a page transport (fetch(url) -> (status, html)) → head peeker
    returning the raw <head> slice (reference peeks bytes up to </head>)."""

    def _peek(url: str) -> str | None:
        status, html = transport.fetch(url)
        if status != 200 or not html:
            return None
        end = html.find("</head>")
        return html[: end + 7] if end != -1 else html

    return _peek


class ContentRelevanceFilter(URLFilter):
    """BM25 relevance of the head section vs a query (filters.py:509-577):
    doc = title×3 + description×2 + keywords + all meta values, scored with
    k1=1.2, b=0.75, fixed avgdl=1000 and the simplified idf
    log(2/(tf+0.5)+1); pass ⇔ score ≥ threshold.  No head ⇒ reject."""

    name = "BM25RelevanceFilter"

    def __init__(self, query, threshold: float, head_fetcher, k1: float = 1.2,
                 b: float = 0.75, avgdl: int = 1000):
        super().__init__()
        self.query = " ".join(query) if isinstance(query, list) else query
        self.query_terms = self.query.lower().split()
        self.threshold = threshold
        self.k1 = k1
        self.b = b
        self.avgdl = avgdl
        self.head_fetcher = head_fetcher

    def _build_document(self, title: str, meta: dict) -> str:
        return " ".join(
            [
                title * 3,
                meta.get("description", "") * 2,
                meta.get("keywords", ""),
                " ".join(meta.values()),
            ]
        )

    def _bm25(self, document: str) -> float:
        doc_terms = document.lower().split()
        doc_len = len(doc_terms)
        tf: dict[str, int] = defaultdict(int)
        for term in doc_terms:
            tf[term] += 1
        score = 0.0
        for term in set(self.query_terms):
            term_freq = tf[term]
            idf = math.log((1 + 1) / (term_freq + 0.5) + 1)
            numerator = term_freq * (self.k1 + 1)
            denominator = term_freq + self.k1 * (
                1 - self.b + self.b * (doc_len / self.avgdl)
            )
            score += idf * (numerator / denominator)
        return score

    def apply(self, url: str) -> bool:
        head = self.head_fetcher(url)
        if not head:
            self.rejected += 1
            return False
        doc = self._build_document(get_title(head) or "", extract_meta_tags(head))
        ok = self._bm25(doc) >= self.threshold
        self.passed += ok
        self.rejected += not ok
        return ok


class SEOFilter(URLFilter):
    """Quantitative head-SEO score (filters.py:580-698): weighted factors
    (title length/keywords, meta description, canonical, robots-noindex,
    ld+json schema, URL shape); pass ⇔ total ≥ threshold.  No head ⇒ reject."""

    name = "SEOFilter"

    DEFAULT_WEIGHTS = {
        "title_length": 0.15,
        "title_kw": 0.18,
        "meta_description": 0.12,
        "canonical": 0.10,
        "robot_ok": 0.20,
        "schema_org": 0.10,
        "url_quality": 0.15,
    }

    def __init__(self, head_fetcher, threshold: float = 0.65,
                 keywords: list[str] | None = None,
                 weights: dict[str, float] | None = None):
        super().__init__()
        self.threshold = threshold
        self._weights = weights or self.DEFAULT_WEIGHTS
        self._kw_patterns = (
            re.compile(r"\b({})\b".format("|".join(map(re.escape, keywords))), re.I)
            if keywords
            else None
        )
        self.head_fetcher = head_fetcher

    def _score_title_length(self, title: str) -> float:
        length = len(title)
        if 50 <= length <= 60:
            return 1.0
        if 40 <= length < 50 or 60 < length <= 70:
            return 0.7
        return 0.3

    def _score_keyword_presence(self, text: str) -> float:
        if not self._kw_patterns:
            return 0.0
        return min(len(self._kw_patterns.findall(text)) * 0.3, 1.0)

    def _score_meta_description(self, desc: str) -> float:
        length = len(desc)
        if 140 <= length <= 160:
            return 1.0
        return 0.5 if 120 <= length <= 200 else 0.2

    def _score_canonical(self, canonical, original: str) -> float:
        if not canonical:
            return 0.5
        return 1.0 if canonical == original else 0.2

    def _score_url_quality(self, parsed_url) -> float:
        score = 1.0
        path = parsed_url.path.lower()
        if len(path) > 80:
            score *= 0.7
        if re.search(r"\d{4}", path):
            score *= 0.8
        if parsed_url.query:
            score *= 0.6
        if "_" in path:
            score *= 0.9
        return score

    def apply(self, url: str) -> bool:
        head = self.head_fetcher(url)
        if not head:
            self.rejected += 1
            return False
        meta = extract_meta_tags(head)
        title = get_title(head) or ""
        scores = {
            "title_length": self._score_title_length(title),
            "title_kw": self._score_keyword_presence(title),
            "meta_description": self._score_meta_description(meta.get("description", "")),
            "canonical": self._score_canonical(meta.get("canonical"), url),
            "robot_ok": 1.0 if "noindex" not in meta.get("robots", "") else 0.0,
            "schema_org": 1.0 if _LDJSON_RE.search(head) else 0.0,
            "url_quality": self._score_url_quality(urlparse(url)),
        }
        total = sum(w * scores[f] for f, w in self._weights.items())
        ok = total >= self.threshold
        self.passed += ok
        self.rejected += not ok
        return ok
