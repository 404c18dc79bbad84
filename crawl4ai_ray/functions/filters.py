"""Frontier URL filters — behavior parity with the reference filter chain.

Parity targets (semantics re-implemented, not copied):
  * ``URLPatternFilter``  — /root/reference/crawl4ai/deep_crawling/filters.py:119-263
  * ``ContentTypeFilter`` — filters.py:266-429
  * ``DomainFilter``      — filters.py:432-506
  * ``FilterChain.apply`` — filters.py:91-116 (all must pass, short-circuit)
  * seeder nonsense-URL gate — async_url_seeder.py:1585-1679 (subset)

Unlike the reference (one ``apply(url)`` call per URL, lru_cache), each filter
here also exposes ``apply_batch(list[str]) -> np.ndarray[bool]`` so the
frontier stage stays a single vectorized pass per Arrow batch; patterns are
compiled once per worker (filter objects are constructed in the actor/closure,
not per batch).
"""

from __future__ import annotations

import fnmatch
import re
from collections.abc import Sequence
from typing import Pattern

import numpy as np


class URLFilter:
    """Base: a named predicate with pass/reject counters."""

    name: str = "filter"

    def __init__(self) -> None:
        self.passed = 0
        self.rejected = 0

    def apply(self, url: str) -> bool:  # pragma: no cover - abstract-ish
        raise NotImplementedError

    def apply_batch(self, urls: Sequence[str]) -> np.ndarray:
        out = np.empty(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            out[i] = self.apply(u)
        self.passed += int(out.sum())
        self.rejected += len(urls) - int(out.sum())
        return out


class FilterChain:
    """All filters must pass; short-circuits on first reject (filters.py:91-116)."""

    def __init__(self, filters: Sequence[URLFilter] = ()) -> None:
        self.filters = list(filters)

    def apply(self, url: str) -> bool:
        return all(f.apply(url) for f in self.filters)

    def apply_batch(self, urls: Sequence[str]) -> np.ndarray:
        mask = np.ones(len(urls), dtype=bool)
        for f in self.filters:
            if not mask.any():
                break
            idx = np.nonzero(mask)[0]
            sub = f.apply_batch([urls[i] for i in idx])
            mask[idx] = sub
        return mask


class URLPatternFilter(URLFilter):
    """Categorized glob/regex matcher (filters.py:119-263).

    Categories: suffix ``*.html``, prefix ``/foo/*`` (with path-boundary
    check), domain ``*.example.com`` (only when the pattern contains
    ``://``), raw regex (starts ``^`` / ends ``$`` / contains ``\\d``),
    everything else a glob translated by fnmatch with ``**`` → ``.*`` and
    ``{a,b}`` → ``(a|b)``.
    """

    name = "url_pattern"

    def __init__(self, patterns, use_glob: bool = True, reverse: bool = False):
        super().__init__()
        self._reverse = reverse
        if isinstance(patterns, (str, Pattern)):
            patterns = [patterns]
        self._suffixes: set[str] = set()
        self._prefixes: set[str] = set()
        self._domain_patterns: list[Pattern] = []
        self._path_patterns: list[Pattern] = []
        for p in patterns:
            self._add(p)

    def _add(self, pattern) -> None:
        if not isinstance(pattern, str):
            self._path_patterns.append(pattern)
            return
        is_regex = pattern.startswith("^") or pattern.endswith("$") or "\\d" in pattern
        if is_regex:
            self._path_patterns.append(re.compile(pattern))
            return
        if pattern.count("*") == 1:
            if pattern.startswith("*.") and "://" not in pattern:
                self._suffixes.add(pattern[2:])
                return
            if pattern.endswith("/*"):
                self._prefixes.add(pattern[:-2])
                return
        if "://" in pattern and pattern.startswith("*."):
            self._domain_patterns.append(re.compile(pattern.replace("*.", r"[^/]+\.")))
            return
        glob = pattern
        if "**" in glob:
            glob = glob.replace("**", ".*")
        if "{" in glob:
            glob = re.sub(
                r"\{([^}]+)\}", lambda m: f"({'|'.join(m.group(1).split(','))})", glob
            )
        self._path_patterns.append(re.compile(fnmatch.translate(glob)))

    def _matches(self, url: str) -> bool:
        if self._suffixes:
            path = url.split("?")[0]
            if path.split("/")[-1].split(".")[-1] in self._suffixes:
                return True
        for pat in self._domain_patterns:
            if pat.match(url):
                return True
        if self._prefixes:
            path = url.split("?")[0]
            for prefix in self._prefixes:
                if path.startswith(prefix) and (
                    len(path) == len(prefix) or path[len(prefix)] in "/?#"
                ):
                    return True
        return any(p.search(url) for p in self._path_patterns)

    def apply(self, url: str) -> bool:
        result = self._matches(url)
        return (not result) if self._reverse else result


# extension → MIME map (subset-faithful port of filters.py:274-369; the full
# table matters only for exotic extensions — extensionless URLs always pass)
_MIME_MAP = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "xhtml": "application/xhtml+xml", "css": "text/css", "csv": "text/csv",
    "ics": "text/calendar", "js": "application/javascript",
    "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
    "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
    "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "m4a": "audio/mp4", "aac": "audio/aac",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "avi": "video/x-msvideo", "mov": "video/quicktime", "flv": "video/x-flv",
    "wmv": "video/x-ms-wmv", "mkv": "video/x-matroska",
    "json": "application/json", "xml": "application/xml",
    "pdf": "application/pdf", "zip": "application/zip",
    "gz": "application/gzip", "tar": "application/x-tar",
    "rar": "application/vnd.rar", "7z": "application/x-7z-compressed",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "otf": "font/otf",
    "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "rtf": "application/rtf", "epub": "application/epub+zip",
    "bin": "application/octet-stream",
    "php": "application/x-httpd-php",
}


class ContentTypeFilter(URLFilter):
    """Allowed MIME types via URL extension (filters.py:266-429).

    Extensionless URLs pass.  ``allowed_types`` match by substring against
    the MIME value ("text" allows text/html, text/plain, ...).
    """

    name = "content_type"

    def __init__(self, allowed_types, check_extension: bool = True):
        super().__init__()
        if isinstance(allowed_types, str):
            allowed_types = [allowed_types]
        allowed = frozenset(t.lower() for t in allowed_types)
        self._check_extension = check_extension
        self._ext_allowed = frozenset(
            ext for ext, mime in _MIME_MAP.items() if any(a in mime for a in allowed)
        )

    @staticmethod
    def _extract_extension(url: str) -> str:
        if "://" in url:
            url = url.split("://", 1)[-1]
        path_start = url.find("/")
        path = url[path_start:] if path_start != -1 else ""
        filename = path.rsplit("/", 1)[-1] if "/" in path else ""
        if "." not in filename:
            return ""
        return filename.rpartition(".")[-1].lower()

    def apply(self, url: str) -> bool:
        if not self._check_extension:
            return True
        ext = self._extract_extension(url)
        if not ext:
            return True
        return ext in self._ext_allowed


class DomainFilter(URLFilter):
    """Allow/block domain lists with subdomain matching (filters.py:432-506)."""

    name = "domain"
    _DOMAIN_RE = re.compile(r"://([^/]+)")

    def __init__(self, allowed_domains=None, blocked_domains=None):
        super().__init__()
        self._allowed = (
            frozenset(self._norm(allowed_domains)) if allowed_domains else None
        )
        self._blocked = (
            frozenset(self._norm(blocked_domains)) if blocked_domains else frozenset()
        )

    @staticmethod
    def _norm(domains):
        if isinstance(domains, str):
            return {domains.lower()}
        return {d.lower() for d in domains}

    @staticmethod
    def _is_subdomain(domain: str, parent: str) -> bool:
        return domain == parent or domain.endswith(f".{parent}")

    def _extract_domain(self, url: str) -> str:
        m = self._DOMAIN_RE.search(url)
        return m.group(1).lower() if m else ""

    def apply(self, url: str) -> bool:
        if not self._blocked and self._allowed is None:
            return True
        domain = self._extract_domain(url)
        for blocked in self._blocked:
            if self._is_subdomain(domain, blocked):
                return False
        if self._allowed is None:
            return True
        return any(self._is_subdomain(domain, a) for a in self._allowed)


# nonsense-URL gate (seeder semantics, async_url_seeder.py:1585-1679 subset:
# utility files, hidden paths, admin/print views)
_NONSENSE_FILES = {
    "robots.txt", "sitemap.xml", "sitemap_index.xml", "favicon.ico",
    "ads.txt", "humans.txt", "security.txt", ".well-known",
}
_NONSENSE_SEGMENTS = re.compile(
    r"/(wp-admin|wp-login|wp-json|xmlrpc\.php|cgi-bin)(/|$)|[?&](print|print_view)=|/\.[^/]+",
    re.IGNORECASE,
)


class NonsenseURLFilter(URLFilter):
    """Drops robots/sitemap/utility/hidden/admin/print URLs."""

    name = "nonsense"

    def apply(self, url: str) -> bool:
        try:
            path = url.split("://", 1)[-1]
            path = path[path.find("/"):] if "/" in path else "/"
        except Exception:
            return False
        last = path.rsplit("/", 1)[-1].split("?")[0].lower()
        if last in _NONSENSE_FILES:
            return False
        if _NONSENSE_SEGMENTS.search(url):
            return False
        return True
