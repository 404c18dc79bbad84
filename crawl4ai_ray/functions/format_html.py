"""fast_format_html — string-level HTML pretty-printer (reference
utils.py:2167-2210).

Bit-for-bit output parity with the reference's replace-and-split formatter,
including its deliberate quirks (void tags like <br> indent; stray "<" in
text starts an "opening tag"; text lines re-indent to the current depth) —
verified by exec-parity tests over synthetic pages and a quirk grid.  The
implementation tokenizes with a regex instead of the reference's
newline-injection trick; the classifier state machine is the spec.

No data semantics — a presentation helper (``ds.map_batches`` over an html
column when a human-readable dump is wanted); never in the crawl hot path.
"""

from __future__ import annotations

import re

# tags (possibly unterminated, matching the reference's treatment of a stray
# "<"), else runs of text; tokens may span newlines and are re-split below
_TOKEN_RE = re.compile(r"<[^<>]*>?|[^<]+")
_INDENT = "  "


def fast_format_html(html_string: str) -> str:
    indent = 0
    formatted: list[str] = []
    for token in _TOKEN_RE.findall(html_string or ""):
        for part in token.split("\n"):
            if not part.strip():
                continue
            if part.startswith("</"):
                indent -= 1
                formatted.append(_INDENT * indent + part)
            elif part.startswith("<") and part.endswith("/>"):
                formatted.append(_INDENT * indent + part)
            elif part.startswith("<"):
                formatted.append(_INDENT * indent + part)
                indent += 1
            else:
                formatted.append(_INDENT * indent + part.strip())
    return "\n".join(formatted)
