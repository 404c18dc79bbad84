"""Frontier URL scorers — behavior parity with the reference scorers.

Parity targets (semantics re-implemented from scratch):
  * ``KeywordRelevanceScorer``  — /root/reference/crawl4ai/deep_crawling/scorers.py:160-188
  * ``PathDepthScorer``         — scorers.py:190-245 (lookup [1.0,.5,.333,.25], then 1/(1+d))
  * ``ContentTypeScorer``       — scorers.py:247-330
  * ``FreshnessScorer``         — scorers.py:332-412 (year table 1.0..0.5, default 0.5)
  * ``DomainAuthorityScorer``   — scorers.py:414-519
  * ``CompositeScorer``         — scorers.py:91-158 (sum of weighted scores, /count when normalize)

Weights go through a float32 round-trip like the reference
(``ctypes.c_float(weight).value``, scorers.py:67) so composite scores match
bit-for-bit.  Each scorer exposes ``score_batch`` for the vectorized frontier
stage; construction (regex compile, table prep) happens once per worker.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import numpy as np

_SCORE_LOOKUP = (1.0, 0.5, 0.3333333333333333, 0.25)
_FRESHNESS_SCORES = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)


def _f32(x: float) -> float:
    return float(np.float32(x))


class URLScorer:
    def __init__(self, weight: float = 1.0):
        self.weight = _f32(weight)

    def _calculate_score(self, url: str) -> float:  # pragma: no cover
        raise NotImplementedError

    def score(self, url: str) -> float:
        return self._calculate_score(url) * self.weight

    def score_batch(self, urls: Sequence[str]) -> np.ndarray:
        return np.fromiter((self.score(u) for u in urls), dtype=np.float64, count=len(urls))


class KeywordRelevanceScorer(URLScorer):
    """Fraction of keywords present in the URL (scorers.py:160-188)."""

    def __init__(self, keywords: Sequence[str], weight: float = 1.0, case_sensitive: bool = False):
        super().__init__(weight)
        self._case_sensitive = case_sensitive
        self._keywords = [k if case_sensitive else k.lower() for k in keywords]

    def _calculate_score(self, url: str) -> float:
        if not self._case_sensitive:
            url = url.lower()
        matches = sum(1 for k in self._keywords if k in url)
        if not matches:
            return 0.0
        if matches == len(self._keywords):
            return 1.0
        return matches / len(self._keywords)


class PathDepthScorer(URLScorer):
    """Distance from optimal path depth (scorers.py:190-245)."""

    def __init__(self, optimal_depth: int = 3, weight: float = 1.0):
        super().__init__(weight)
        self._optimal_depth = optimal_depth

    @staticmethod
    def _depth(path: str) -> int:
        if not path or path == "/":
            return 0
        if "/" not in path:
            return 0
        depth = 0
        last_was_slash = True
        for c in path:
            if c == "/":
                if not last_was_slash:
                    depth += 1
                last_was_slash = True
            else:
                last_was_slash = False
        if not last_was_slash:
            depth += 1
        return depth

    def _calculate_score(self, url: str) -> float:
        pos = url.find("/", url.find("://") + 3)
        depth = 0 if pos == -1 else self._depth(url[pos:])
        distance = abs(depth - self._optimal_depth)
        if distance < 4:
            return _SCORE_LOOKUP[distance]
        return 1.0 / (1.0 + distance)


class ContentTypeScorer(URLScorer):
    """Extension → score map with regex fallbacks (scorers.py:247-330)."""

    def __init__(self, type_weights: dict[str, float], weight: float = 1.0):
        super().__init__(weight)
        self._exact: dict[str, float] = {}
        self._regex: list[tuple[re.Pattern, float]] = []
        for pattern, score in type_weights.items():
            if pattern.startswith(".") and pattern.endswith("$"):
                self._exact[pattern[1:-1]] = score
            else:
                self._regex.append((re.compile(pattern), score))
        self._regex.sort(key=lambda x: -x[1])

    @staticmethod
    def _quick_extension(url: str) -> str:
        pos = url.rfind(".")
        if pos == -1:
            return ""
        end = len(url)
        for i in range(pos + 1, len(url)):
            c = url[i]
            if c in "?#;" or not c.isalnum():
                end = i
                break
        return url[pos + 1 : end].lower()

    def _calculate_score(self, url: str) -> float:
        ext = self._quick_extension(url)
        if ext:
            score = self._exact.get(ext)
            if score is not None:
                return score
        for pattern, score in self._regex:
            if pattern.search(url):
                return score
        return 0.0


class FreshnessScorer(URLScorer):
    """Newest plausible year in the URL (scorers.py:332-412)."""

    def __init__(self, weight: float = 1.0, current_year: int = 2024):
        super().__init__(weight)
        self._current_year = current_year
        self._date_pattern = re.compile(
            r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?"
        )

    def _extract_year(self, url: str):
        latest = None
        for m in self._date_pattern.finditer(url):
            year = int(m.group(1))
            if year <= self._current_year and (latest is None or year > latest):
                latest = year
        return latest

    def _calculate_score(self, url: str) -> float:
        year = self._extract_year(url)
        if year is None:
            return 0.5
        diff = self._current_year - year
        if diff < len(_FRESHNESS_SCORES):
            return _FRESHNESS_SCORES[diff]
        return max(0.1, 1.0 - diff * 0.1)


class DomainAuthorityScorer(URLScorer):
    """Domain → weight map with default (scorers.py:414-519)."""

    def __init__(self, domain_weights: dict[str, float], default_weight: float = 0.5, weight: float = 1.0):
        super().__init__(weight)
        self._domain_weights = {d.lower(): s for d, s in domain_weights.items()}
        self._default = default_weight

    @staticmethod
    def _extract_domain(url: str) -> str:
        start = url.find("://")
        start = 0 if start == -1 else start + 3
        end = url.find("/", start)
        if end == -1:
            end = url.find("?", start)
            if end == -1:
                end = url.find("#", start)
                if end == -1:
                    end = len(url)
        domain = url[start:end]
        port_idx = domain.rfind(":")
        if port_idx != -1:
            domain = domain[:port_idx]
        return domain.lower()

    def _calculate_score(self, url: str) -> float:
        return self._domain_weights.get(self._extract_domain(url), self._default)


class CompositeScorer(URLScorer):
    """Sum of member ``score()``s, /count when normalize (scorers.py:91-158)."""

    def __init__(self, scorers: Sequence[URLScorer], normalize: bool = True):
        super().__init__(1.0)
        self._scorers = list(scorers)
        self._normalize = normalize

    def _calculate_score(self, url: str) -> float:
        # member scores round-trip through float32 before accumulation, like
        # the reference's pre-allocated array('f') buffer (scorers.py:112,135)
        total = sum(_f32(s.score(url)) for s in self._scorers)
        if self._normalize and self._scorers:
            return total / len(self._scorers)
        return total

    def score(self, url: str) -> float:
        return self._calculate_score(url)
