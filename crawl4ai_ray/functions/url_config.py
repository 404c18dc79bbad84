"""Per-URL run-config selection — parity with the reference's
``BaseDispatcher.select_config`` (/root/reference/crawl4ai/
async_dispatcher.py:101-125) and ``CrawlerRunConfig.is_match`` /
``url_matcher`` (/root/reference/crawl4ai/async_configs.py:35-40,1570-1612):

  * a config with no matcher matches everything;
  * a matcher may be a glob string, a callable, or a mixed list combined
    with MatchMode.OR (default) or AND; an empty list matches nothing;
  * the FIRST matching config wins; no match ⇒ the URL is skipped.

Ray mapping: ``ConfigSelectStage`` — matchers compile per worker; each batch
gains a ``config_idx`` column (int32) and no-match rows are dropped, so each
downstream stage can dispatch on the index (e.g. per-config fetch options)
without re-matching."""

from __future__ import annotations

from enum import Enum
from fnmatch import fnmatch

import numpy as np
import pyarrow as pa


class MatchMode(Enum):
    OR = "or"
    AND = "and"


class UrlConfig:
    """One run-config slot: a matcher plus an opaque payload of per-URL
    settings (the engine equivalent of CrawlerRunConfig's knobs)."""

    def __init__(self, url_matcher=None, match_mode: MatchMode = MatchMode.OR,
                 payload: dict | None = None):
        self.url_matcher = url_matcher
        self.match_mode = match_mode
        self.payload = payload or {}

    def is_match(self, url: str) -> bool:
        m = self.url_matcher
        if m is None:
            return True
        if callable(m):
            return m(url)
        if isinstance(m, str):
            return fnmatch(url, m)
        if isinstance(m, list):
            if not m:
                return False
            results = []
            for matcher in m:
                if callable(matcher):
                    results.append(matcher(url))
                elif isinstance(matcher, str):
                    results.append(fnmatch(url, matcher))
            if self.match_mode == MatchMode.OR:
                return any(results) if results else False
            return all(results) if results else False
        return False


def select_config(url: str, configs) -> UrlConfig | None:
    """First url_matcher match wins; None ⇒ skip the URL (reference
    select_config semantics, including the single-config passthrough)."""
    if isinstance(configs, UrlConfig):
        return configs
    if not configs:
        return None
    for config in configs:
        if config.is_match(url):
            return config
    return None


class ConfigSelectStage:
    """map_batches stage: append ``config_idx`` (index of the first matching
    config) and drop no-match rows (reference: unmatched URLs are skipped)."""

    def __init__(self, configs: list[UrlConfig], url_col: str = "url"):
        self.configs = configs
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self.url_col).to_pylist()
        idx = np.full(len(urls), -1, dtype=np.int32)
        for i, u in enumerate(urls):
            for ci, cfg in enumerate(self.configs):
                if cfg.is_match(u):
                    idx[i] = ci
                    break
        out = batch.append_column("config_idx", pa.array(idx, type=pa.int32()))
        return out.filter(pa.array(idx >= 0))
