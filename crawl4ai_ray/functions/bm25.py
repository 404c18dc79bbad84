"""BM25 — behavioral parity with the reference's BM25 usage.

The reference uses ``rank_bm25.BM25Okapi`` in two places (SURVEY.md §2.7):
  * content filtering: score text chunks against a page query built from
    head metadata (content_filter_strategy.py:507-530);
  * seeder URL scoring: min-max-normalized scores, all-equal → 0.5
    (async_url_seeder.py:1681-1725).

``rank_bm25`` isn't in this container; ``BM25Okapi`` here reimplements the
same published Okapi formula (k1=1.5, b=0.75, eps=0.25, negative IDFs floored
at eps·avg_idf) from the algorithm description.

Corpus-level BM25 over a Dataset is the **barrier aggregation** pattern: a
first pass accumulates (N, Σdl, df per query term) as per-batch partials
combined on the driver (tiny — one dict per query term), which then broadcast
into a second scoring pass.  The corpus is streamed twice, never collected.
"""

from __future__ import annotations

import math

import pyarrow as pa


class BM25Okapi:
    def __init__(self, corpus: list[list[str]], k1: float = 1.5, b: float = 0.75, epsilon: float = 0.25):
        self.k1 = k1
        self.b = b
        self.epsilon = epsilon
        self.corpus_size = len(corpus)
        self.doc_len = [len(d) for d in corpus]
        self.avgdl = sum(self.doc_len) / self.corpus_size if self.corpus_size else 0.0
        self.doc_freqs: list[dict[str, int]] = []
        nd: dict[str, int] = {}
        for doc in corpus:
            freqs: dict[str, int] = {}
            for w in doc:
                freqs[w] = freqs.get(w, 0) + 1
            self.doc_freqs.append(freqs)
            for w in freqs:
                nd[w] = nd.get(w, 0) + 1
        self.idf = self._calc_idf(nd)

    def _calc_idf(self, nd: dict[str, int]) -> dict[str, float]:
        idf: dict[str, float] = {}
        idf_sum = 0.0
        negative: list[str] = []
        for word, freq in nd.items():
            v = math.log(self.corpus_size - freq + 0.5) - math.log(freq + 0.5)
            idf[word] = v
            idf_sum += v
            if v < 0:
                negative.append(word)
        avg_idf = idf_sum / len(idf) if idf else 0.0
        eps = self.epsilon * avg_idf
        for word in negative:
            idf[word] = eps
        return idf

    def get_scores(self, query: list[str]) -> list[float]:
        scores = [0.0] * self.corpus_size
        for q in query:
            q_idf = self.idf.get(q)
            if q_idf is None:
                continue
            for i, freqs in enumerate(self.doc_freqs):
                f = freqs.get(q, 0)
                if not f:
                    continue
                denom = f + self.k1 * (1 - self.b + self.b * self.doc_len[i] / self.avgdl)
                scores[i] += q_idf * f * (self.k1 + 1) / denom
        return scores


def normalized_bm25(query: str, documents: list[str]) -> list[float]:
    """Seeder semantics (async_url_seeder.py:1694-1725): whitespace
    tokenization, min-max normalization, all-equal ⇒ 0.5."""
    if not query or not documents:
        return [0.0] * len(documents)
    tokenized = [d.lower().split() for d in documents]
    if all(len(d) == 0 for d in tokenized):
        return [0.0] * len(documents)
    scores = BM25Okapi(tokenized).get_scores(query.lower().split())
    if not scores:
        return []
    lo, hi = min(scores), max(scores)
    if hi == lo:
        return [0.5] * len(scores)
    return [(s - lo) / (hi - lo) for s in scores]


# ------------------------------------------------------------- Dataset op

def bm25_rank_dataset(ds, query: str, text_col: str = "text", id_col: str = "doc_id",
                      k1: float = 1.5, b: float = 0.75):
    """Two-pass streaming BM25 over a Dataset: pass 1 aggregates corpus
    statistics for the query terms (partial-combine), pass 2 scores.
    Returns a Dataset[(id_col, bm25)] (unnormalized Okapi scores)."""
    import numpy as np

    q_terms = sorted(set(query.lower().split()))

    def _partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        df = {t: 0 for t in q_terms}
        total_len = 0
        for text in texts:
            toks = (text or "").lower().split()
            total_len += len(toks)
            tokset = set(toks)
            for t in q_terms:
                if t in tokset:
                    df[t] += 1
        return pa.table(
            {
                "n_docs": pa.array([len(texts)], type=pa.int64()),
                "total_len": pa.array([total_len], type=pa.int64()),
                **{f"df_{i}": pa.array([df[t]], type=pa.int64()) for i, t in enumerate(q_terms)},
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n_docs = sum(r["n_docs"] for r in partials)
    total_len = sum(r["total_len"] for r in partials)
    if n_docs == 0:
        return ds.map_batches(lambda b: pa.table({id_col: b.column(id_col)}))
    avgdl = total_len / n_docs
    df = {t: sum(r[f"df_{i}"] for r in partials) for i, t in enumerate(q_terms)}
    # Okapi IDF with epsilon floor (rank_bm25 semantics)
    raw = {t: math.log(n_docs - df[t] + 0.5) - math.log(df[t] + 0.5) for t in q_terms}
    avg_idf = sum(raw.values()) / len(raw) if raw else 0.0
    idf = {t: (v if v >= 0 else 0.25 * avg_idf) for t, v in raw.items()}

    def _score(batch: pa.Table) -> pa.Table:
        from .numeric import duck_round

        texts = batch.column(text_col).to_pylist()
        out = []
        for text in texts:
            toks = (text or "").lower().split()
            dl = len(toks)
            freqs: dict[str, int] = {}
            for w in toks:
                if w in idf:
                    freqs[w] = freqs.get(w, 0) + 1
            s = 0.0
            # sorted q_terms order + duck_round: float-add order and rounding
            # mode match the SQL oracle exactly
            for t in q_terms:
                f = freqs.get(t, 0)
                if not f:
                    continue
                denom = f + k1 * (1 - b + b * dl / avgdl)
                s += idf[t] * f * (k1 + 1) / denom
            out.append(float(duck_round(s, 6)))
        return pa.table(
            {id_col: batch.column(id_col), "bm25": pa.array(out, type=pa.float64())}
        )

    return ds.map_batches(_score, batch_format="pyarrow", zero_copy_batch=True)
