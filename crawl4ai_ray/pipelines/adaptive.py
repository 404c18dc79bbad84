"""Adaptive crawler — behavioral port of the reference's statistical
strategy (/root/reference/crawl4ai/adaptive_crawler.py):

  * state: term/document frequencies, documents_with_terms, new-terms
    history, pending links, crawl order (CrawlState, adaptive_crawler.py:27-51)
  * confidence = 0.4·coverage + 0.3·consistency + 0.3·saturation
    (adaptive_crawler.py:311-413; sqrt-curved coverage, pairwise-jaccard
    consistency, new-term-rate saturation)
  * link ranking = 0.5·relevance + 0.3·novelty + 0.2·authority with
    term-overlap relevance and new-term novelty (adaptive_crawler.py:414-519,
    AdaptiveConfig defaults :156-173)
  * digest loop: crawl batch → update state → confidence → stop test →
    rank links → top-k → repeat (adaptive_crawler.py:1308-1452)

Ray Data mapping (SURVEY.md §2.7): each round's fetch+extract batch runs
through a small Dataset pipeline; the TF/DF aggregation is the reference's
per-document sequential fold (kept on the driver — the knowledge-base is
max_pages ≤ tens of documents by construction).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.extract import extract_batch
from ..urlnorm import normalize_url_for_deep_crawl

_TOKEN_CLEAN = re.compile(r"[^\w\s]")


def tokenize(text: str) -> list[str]:
    """Reference _tokenize (adaptive_crawler.py:600-609): strip punctuation,
    split, keep tokens longer than 2 chars."""
    text = _TOKEN_CLEAN.sub(" ", text)
    return [t for t in text.split() if len(t) > 2]


@dataclass
class AdaptiveConfig:
    confidence_threshold: float = 0.7
    max_pages: int = 20
    top_k_links: int = 3
    min_gain_threshold: float = 0.1
    saturation_threshold: float = 0.8
    relevance_weight: float = 0.5
    novelty_weight: float = 0.3
    authority_weight: float = 0.2


@dataclass
class CrawlState:
    query: str = ""
    term_frequencies: Counter = field(default_factory=Counter)
    document_frequencies: Counter = field(default_factory=Counter)
    documents_with_terms: dict = field(default_factory=lambda: defaultdict(set))
    new_terms_history: list = field(default_factory=list)
    knowledge_terms: list = field(default_factory=list)  # per-doc term lists
    crawled_urls: set = field(default_factory=set)
    pending_links: list = field(default_factory=list)  # dicts href/text/title
    crawl_order: list = field(default_factory=list)
    total_documents: int = 0
    metrics: dict = field(default_factory=dict)

    def to_jsonable(self) -> dict:
        """JSON checkpoint (reference CrawlState.save, adaptive_crawler.py:53-80)."""
        return {
            "query": self.query,
            "term_frequencies": dict(self.term_frequencies),
            "document_frequencies": dict(self.document_frequencies),
            "new_terms_history": list(self.new_terms_history),
            "crawled_urls": sorted(self.crawled_urls),
            "pending_links": list(self.pending_links),
            "crawl_order": list(self.crawl_order),
            "total_documents": self.total_documents,
            "metrics": dict(self.metrics),
        }


class AdaptiveCrawler:
    def __init__(self, transport, query: str, config: AdaptiveConfig | None = None,
                 robots_bodies: dict | None = None):
        self.transport = transport
        self.config = config or AdaptiveConfig()
        self.state = CrawlState(query=query)

    # ---------------------------------------------------------- metrics
    def _coverage(self) -> float:
        s = self.state
        if not s.query or s.total_documents == 0:
            return 0.0
        query_terms = tokenize(s.query.lower())
        if not query_terms:
            return 0.0
        max_tf = max(s.term_frequencies.values()) if s.term_frequencies else 1
        scores = []
        for term in query_terms:
            tf = s.term_frequencies.get(term, 0)
            df = s.document_frequencies.get(term, 0)
            if df > 0:
                doc_coverage = df / s.total_documents
                freq_signal = (
                    math.log(1 + tf) / math.log(1 + max_tf) if max_tf > 0 else 0
                )
                scores.append(doc_coverage * (1 + 0.5 * freq_signal))
            else:
                scores.append(0.0)
        return min(1.0, math.sqrt(sum(scores) / len(scores)))

    def _consistency(self) -> float:
        docs = self.state.knowledge_terms
        if len(docs) < 2:
            return 1.0
        overlaps = []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                a, b = set(docs[i]), set(docs[j])
                if a and b:
                    overlaps.append(len(a & b) / len(a | b))
        return sum(overlaps) / len(overlaps) if overlaps else 0.0

    def _saturation(self) -> float:
        h = self.state.new_terms_history
        if len(h) < 2:
            return 0.0
        recent = h[-1] if h[-1] > 0 else 1
        initial = h[0] if h[0] > 0 else 1
        return max(0.0, min(1 - recent / initial, 1.0))

    def confidence(self) -> float:
        if not self.state.knowledge_terms:
            return 0.0
        cov, con, sat = self._coverage(), self._consistency(), self._saturation()
        self.state.metrics.update(
            {"coverage": cov, "consistency": con, "saturation": sat}
        )
        return 0.4 * cov + 0.3 * con + 0.3 * sat

    # ------------------------------------------------------------ links
    def _relevance(self, link: dict) -> float:
        text = " ".join(filter(None, [link.get("text"), link.get("title")])).lower()
        if not text:
            return 0.0
        q = set(tokenize(self.state.query.lower()))
        if not q:
            return 0.0
        return len(q & set(tokenize(text))) / len(q)

    def _novelty(self, link: dict) -> float:
        if not self.state.knowledge_terms:
            return 1.0
        text = " ".join(filter(None, [link.get("text"), link.get("title")])).lower()
        terms = set(tokenize(text))
        if not terms:
            return 0.5
        new = terms - set(self.state.term_frequencies.keys())
        return len(new) / len(terms)

    def rank_links(self) -> list[tuple[dict, float]]:
        cfg = self.config
        scored = []
        for link in self.state.pending_links:
            if link["href"] in self.state.crawled_urls:
                continue
            score = (
                cfg.relevance_weight * self._relevance(link)
                + cfg.novelty_weight * self._novelty(link)
                + cfg.authority_weight * 1.0
            )
            scored.append((link, score))
        scored.sort(key=lambda x: -x[1])
        return scored

    # ------------------------------------------------------------ rounds
    def _fetch_extract(self, urls: list[str]) -> list[dict]:
        """One round's batch through a small Ray pipeline (completion data
        re-ordered to the input url order for deterministic state folds)."""
        transport = self.transport

        def _fetch(batch: pa.Table) -> pa.Table:
            us = batch.column("url").to_pylist()
            statuses, htmls = [], []
            for u in us:
                st, html = transport.fetch(u)
                statuses.append(st)
                htmls.append(html)
            return pa.table(
                {
                    "url": pa.array(us, type=pa.string()),
                    "html": pa.array(htmls, type=pa.string()),
                    "status_code": pa.array(statuses, type=pa.int16()),
                    "success": pa.array([s == 200 for s in statuses], type=pa.bool_()),
                }
            )

        ds = ray.data.from_items([{"url": u} for u in urls])
        rows = (
            ds.map_batches(_fetch, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(extract_batch, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        )
        by_url = {r["url"]: r for r in rows}
        return [by_url[u] for u in urls if u in by_url]

    def _update_state(self, results: list[dict]) -> None:
        """Reference update_state fold (adaptive_crawler.py:550-598)."""
        s = self.state
        for r in results:
            old_count = len(s.term_frequencies)
            terms = tokenize((r.get("markdown") or "").lower())
            term_set = set()
            for t in terms:
                s.term_frequencies[t] += 1
                term_set.add(t)
            doc_id = s.total_documents
            for t in term_set:
                if doc_id not in s.documents_with_terms[t]:
                    s.document_frequencies[t] += 1
                    s.documents_with_terms[t].add(doc_id)
            s.new_terms_history.append(len(s.term_frequencies) - old_count)
            s.total_documents += 1
            s.knowledge_terms.append(terms)
            s.crawl_order.append(r["url"])

    def should_stop(self) -> bool:
        s, cfg = self.state, self.config
        if s.total_documents >= cfg.max_pages:
            return True
        if self.confidence() >= cfg.confidence_threshold:
            return True
        if not any(
            l["href"] not in s.crawled_urls for l in s.pending_links
        ):
            return True
        if s.metrics.get("saturation", 0.0) >= cfg.saturation_threshold:
            return True
        return False

    def digest(self, start_url: str) -> dict:
        """The adaptive loop (adaptive_crawler.py:1308-1452)."""
        s, cfg = self.state, self.config
        start = normalize_url_for_deep_crawl(start_url, start_url)
        batch = [start]
        while batch:
            s.crawled_urls.update(batch)
            results = self._fetch_extract(batch)
            ok = [r for r in results if r["success"]]
            self._update_state(ok)
            for r in ok:
                for link in r["links"] or []:
                    if not link["internal"]:
                        continue
                    norm = normalize_url_for_deep_crawl(link["href"], r["url"])
                    if norm and norm not in s.crawled_urls:
                        s.pending_links.append(
                            {"href": norm, "text": link["text"], "title": link["title"]}
                        )
            if self.should_stop():
                break
            ranked = [
                (l, sc) for l, sc in self.rank_links() if sc >= cfg.min_gain_threshold
            ]
            batch = []
            for link, _ in ranked[: cfg.top_k_links]:
                if link["href"] not in s.crawled_urls:
                    batch.append(link["href"])
        return {
            "confidence": self.confidence(),
            "pages_crawled": s.total_documents,
            "metrics": dict(s.metrics),
            "crawl_order": list(s.crawl_order),
            "state": s.to_jsonable(),
        }


def default_query_variations(query: str, n: int = 10) -> list[str]:
    """Deterministic stand-in for the reference's LLM query expansion
    (adaptive_crawler.py::map_query_semantic_space — the LLM is absent in
    this sandbox): token rotations and single-token dropouts around the
    query.  A real deployment plugs an LLM-backed variations_fn in the
    same slot."""
    toks = query.split()
    out = [query]
    for i in range(1, n + 1):
        if len(toks) > 1:
            rot = toks[i % len(toks):] + toks[: i % len(toks)]
            if i % 2 == 0 and len(rot) > 1:
                rot = rot[:-1]
            out.append(" ".join(rot))
        else:
            out.append(f"{query} aspect{i}")
    return out


class EmbeddingAdaptiveCrawler(AdaptiveCrawler):
    """Embedding-based adaptive strategy — semantics of the reference's
    EmbeddingStrategy (adaptive_crawler.py:587-990):

      * the query becomes a point cloud (variations → embeddings);
      * confidence = mean best cosine similarity of query points vs the
        knowledge base (calculate_confidence, :967-990);
      * coverage gaps = query points whose nearest KB doc is farther than
        ``coverage_radius`` (find_coverage_gaps, :812-840);
      * links score by how much they close gaps (improvement ×2 averaged
        over gaps needing help), penalized for ≥``overlap_threshold``
        similarity to existing KB docs (select_links_for_expansion,
        :850-965); blended 0.8/0.2 with the contextual term score.

    Embeddings/variations are pluggable callables (deterministic hashing
    defaults — no model in this sandbox); link embeddings are cached per
    (href, text) like the reference's _link_embedding_cache."""

    def __init__(self, transport, query: str, config: AdaptiveConfig | None = None,
                 robots_bodies: dict | None = None, embed_fn=None,
                 variations_fn=None, n_variations: int = 8,
                 coverage_radius: float = 0.2, overlap_threshold: float = 0.85):
        super().__init__(transport, query, config, robots_bodies)
        if embed_fn is None:
            from ..functions.cosine_cluster import hashed_embedding

            embed_fn = hashed_embedding
        self.embed_fn = embed_fn
        self.coverage_radius = coverage_radius
        self.overlap_threshold = overlap_threshold
        variations = (variations_fn or default_query_variations)(query, n_variations)
        q = np.asarray(self.embed_fn(variations), dtype=np.float64)
        self.query_embeddings = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-8)
        self.kb_embeddings: np.ndarray | None = None
        self._link_embedding_cache: dict[str, np.ndarray] = {}

    # ---------------------------------------------------------- metrics
    def confidence(self) -> float:
        if self.kb_embeddings is None or len(self.kb_embeddings) == 0:
            return 0.0
        best = (self.query_embeddings @ self.kb_embeddings.T).max(axis=1)
        self.state.metrics["coverage_score"] = float(best.mean())
        self.state.metrics["median_best_similarity"] = float(np.median(best))
        return float(best.mean())

    def _gaps(self) -> list[tuple[np.ndarray, float]]:
        if self.kb_embeddings is None or len(self.kb_embeddings) == 0:
            return [(q, 1.0) for q in self.query_embeddings]
        dist = 1.0 - self.query_embeddings @ self.kb_embeddings.T
        min_d = dist.min(axis=1)
        return [(q, float(d)) for q, d in zip(self.query_embeddings, min_d)]

    # ------------------------------------------------------------ links
    def _link_embedding(self, link: dict) -> np.ndarray | None:
        text = " ".join(filter(None, [link.get("text"), link.get("title")]))
        if not text.strip():
            return None
        key = f"{link['href']}:{text}"
        if key not in self._link_embedding_cache:
            v = np.asarray(self.embed_fn([text])[0], dtype=np.float64)
            self._link_embedding_cache[key] = v / (np.linalg.norm(v) + 1e-8)
        return self._link_embedding_cache[key]

    def rank_links(self) -> list[tuple[dict, float]]:
        gaps = self._gaps()
        gaps_needing_help = [g for g in gaps if g[1] > self.coverage_radius]
        scored = []
        for link in self.state.pending_links:
            if link["href"] in self.state.crawled_urls:
                continue
            emb = self._link_embedding(link)
            if emb is None:
                continue
            if not gaps_needing_help:
                score = 0.0
            else:
                total_improvement = 0.0
                for gap_point, gap_distance in gaps_needing_help:
                    new_distance = 1.0 - float(emb @ gap_point)
                    if new_distance < gap_distance:
                        total_improvement += (gap_distance - new_distance) * 2
                score = total_improvement / len(gaps_needing_help)
                if self.kb_embeddings is not None and len(self.kb_embeddings):
                    max_sim = float((self.kb_embeddings @ emb).max())
                    if max_sim > self.overlap_threshold:
                        score *= 1 - (max_sim - self.overlap_threshold) * 2
                # blend with the statistical contextual score (reference
                # :960-961)
                score = score * 0.8 + self._relevance(link) * 0.2
            scored.append((link, score))
        scored.sort(key=lambda x: -x[1])
        return scored

    # ------------------------------------------------------------ state
    def _update_state(self, results: list[dict]) -> None:
        super()._update_state(results)
        texts = [(r.get("markdown") or "") for r in results]
        if not texts:
            return
        m = np.asarray(self.embed_fn(texts), dtype=np.float64)
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-8)
        self.kb_embeddings = (
            m if self.kb_embeddings is None else np.vstack([self.kb_embeddings, m])
        )

    # ------------------------------------------------------------ persist
    def state_jsonable(self) -> dict:
        """Reference CrawlState.save with the embedding extras
        (adaptive_crawler.py:53-80: kb/query embeddings serialize as
        nested lists)."""
        d = self.state.to_jsonable()
        d["kb_embeddings"] = (
            self.kb_embeddings.tolist() if self.kb_embeddings is not None else None
        )
        d["query_embeddings"] = self.query_embeddings.tolist()
        return d

    def load_state(self, d: dict) -> None:
        """Reference CrawlState.load (adaptive_crawler.py:82-108): restore
        term stats + embedding matrices; crawl resumes mid-digest."""
        s = self.state
        s.term_frequencies = Counter(d.get("term_frequencies", {}))
        s.document_frequencies = Counter(d.get("document_frequencies", {}))
        s.new_terms_history = list(d.get("new_terms_history", []))
        s.crawled_urls = set(d.get("crawled_urls", []))
        s.pending_links = list(d.get("pending_links", []))
        s.crawl_order = list(d.get("crawl_order", []))
        s.total_documents = d.get("total_documents", 0)
        s.metrics = dict(d.get("metrics", {}))
        if d.get("kb_embeddings") is not None:
            self.kb_embeddings = np.asarray(d["kb_embeddings"], dtype=np.float64)
        if d.get("query_embeddings") is not None:
            self.query_embeddings = np.asarray(d["query_embeddings"], dtype=np.float64)
