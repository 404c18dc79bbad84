"""Link preview + scoring: head-data join onto link records and the
reference's link quality scores.

Parity targets:
  * ``calculate_link_intrinsic_score`` — /root/reference/crawl4ai/
    utils.py:3380-3492 (attribute/url/text/contextual factors, 0–10);
  * ``calculate_total_score`` — utils.py:3495-3540
    (0.7·intrinsic + 0.3·contextual·10);
  * head-data merge onto links by URL — link_preview.py:276-…
    (``_merge_head_data``), realized as a broadcast-dict join: head results
    are bounded by ``max_links`` per page, so the small side rides ``ray.put``
    while the links stream (SURVEY.md §2.6).
"""

from __future__ import annotations

import pyarrow as pa
import ray

_GOOD_PATHS = ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")
_MED_PATHS = ("/blog/", "/article/", "/post/", "/news/")
_BAD_PATHS = ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")
_GENERIC = {"click here", "read more", "more info", "link", "here"}
_PUNCT = '.,!?;:"()[]{}'


def link_intrinsic_score(
    link_text: str,
    url: str,
    title_attr: str = "",
    class_attr: str = "",
    rel_attr: str = "",
    page_context: dict | None = None,
) -> float:
    page_context = page_context or {}
    score = 0.0
    if title_attr and len(title_attr.strip()) > 3:
        score += 1.0
    class_str = (class_attr or "").lower()
    if any(c in class_str for c in ("nav", "menu", "primary", "main", "important")):
        score += 1.5
    if any(c in class_str for c in ("ad", "sponsor", "track", "promo", "banner")):
        score -= 1.0
    rel_str = (rel_attr or "").lower()
    if any(r in rel_str for r in ("canonical", "next", "prev", "chapter")):
        score += 1.0
    if any(r in rel_str for r in ("nofollow", "sponsored", "ugc")):
        score -= 0.5
    url_lower = url.lower()
    if any(p in url_lower for p in _GOOD_PATHS):
        score += 2.0
    elif any(p in url_lower for p in _MED_PATHS):
        score += 1.0
    if any(p in url_lower for p in _BAD_PATHS):
        score -= 1.5
    url_depth = url.count("/") - 2
    if url_depth <= 2:
        score += 1.0
    elif url_depth > 5:
        score -= 0.5
    if url.startswith("https://"):
        score += 0.5
    if link_text:
        text_clean = link_text.strip()
        if len(text_clean) > 3:
            score += 1.0
        wc = len(text_clean.split())
        if wc >= 2:
            score += 0.5
        if wc >= 4:
            score += 0.5
        if text_clean.lower() in _GENERIC:
            score -= 1.0
    terms = page_context.get("terms")
    if terms and link_text:
        link_words = {
            w.strip(_PUNCT).lower()
            for w in link_text.split()
            if len(w.strip(_PUNCT)) > 2
        }
        if link_words:
            overlap = len(link_words & terms)
            if overlap > 0:
                score += (overlap / min(len(link_words), 10)) * 2.0
    if page_context.get("is_docs_site") and link_text:
        if any(k in link_text.lower() for k in ("api", "reference", "guide", "tutorial", "example")):
            score += 1.0
    return max(0.0, min(score, 10.0))


def total_link_score(intrinsic: float, contextual: float) -> float:
    """utils.py:3495-3540: 0.7·intrinsic + 0.3·contextual·10."""
    return 0.7 * intrinsic + 0.3 * contextual * 10.0


def join_head_data(links_ds, head_lookup: dict[str, dict]):
    """links(href, ...) ⋈ head_lookup on href (broadcast small side)."""
    ref = ray.put(head_lookup)

    def _join(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        hrefs = batch.column("href").to_pylist()
        heads = [lookup.get(h) or {} for h in hrefs]
        return batch.append_column(
            "head_title", pa.array([h.get("title", "") for h in heads], type=pa.string())
        ).append_column(
            "head_description",
            pa.array([h.get("description", "") for h in heads], type=pa.string()),
        ).append_column(
            "head_found", pa.array([bool(h) for h in heads], type=pa.bool_())
        )

    return links_ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)
