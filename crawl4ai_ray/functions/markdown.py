"""Markdown post-processing — citation rewriting parity with the reference
(``convert_links_to_citations``, /root/reference/crawl4ai/
markdown_generation_strategy.py:82-146): stable ⟨n⟩ ids assigned in
first-seen order, image links keep the ``![..]`` form, references section
appended in id order.

Ray Data mapping: pure string transform inside ``map_batches``
(SURVEY.md §2.2).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pyarrow as pa

# markdown links: optional image-bang, [text](url "title"?)
LINK_PATTERN = re.compile(r'!?\[([^\]]*)\]\(([^)\s]+)(?:\s+"([^"]*)")?\)')


def convert_links_to_citations(markdown: str, base_url: str = "") -> tuple[str, str]:
    link_map: dict[str, tuple[int, str]] = {}
    url_cache: dict[str, str] = {}
    parts: list[str] = []
    last_end = 0
    counter = 1
    for match in LINK_PATTERN.finditer(markdown):
        parts.append(markdown[last_end : match.start()])
        text, url, title = match.groups()
        if base_url and not url.startswith(("http://", "https://", "mailto:")):
            if url not in url_cache:
                url_cache[url] = urljoin(base_url, url)
            url = url_cache[url]
        if url not in link_map:
            desc = []
            if title:
                desc.append(title)
            if text and text != title:
                desc.append(text)
            link_map[url] = (counter, ": " + " - ".join(desc) if desc else "")
            counter += 1
        num = link_map[url][0]
        parts.append(
            f"{text}⟨{num}⟩"
            if not match.group(0).startswith("!")
            else f"![{text}⟨{num}⟩]"
        )
        last_end = match.end()
    parts.append(markdown[last_end:])
    converted = "".join(parts)
    references = ["\n\n## References\n\n"]
    references.extend(
        f"⟨{num}⟩ {url}{desc}\n"
        for url, (num, desc) in sorted(link_map.items(), key=lambda x: x[1][0])
    )
    return converted, "".join(references)


def citations_batch(batch: pa.Table, markdown_col: str = "markdown", url_col: str = "url") -> pa.Table:
    mds = batch.column(markdown_col).to_pylist()
    urls = batch.column(url_col).to_pylist()
    cited, refs = [], []
    for md, url in zip(mds, urls):
        c, r = convert_links_to_citations(md or "", url or "")
        cited.append(c)
        refs.append(r)
    return batch.append_column(
        "markdown_with_citations", pa.array(cited, type=pa.string())
    ).append_column("references_markdown", pa.array(refs, type=pa.string()))
