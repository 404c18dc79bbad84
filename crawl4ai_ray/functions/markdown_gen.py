"""html → markdown converter with html2text fidelity on the feature slice
the crawl pipeline emits — parity with the reference's
``DefaultMarkdownGenerator`` configuration (CustomHTML2Text with
body_width=0, single_line_break=True, mark_code=True;
/root/reference/crawl4ai/markdown_generation_strategy.py:181-200, vendored
converter /root/reference/crawl4ai/html2text/).

Covered (golden-tested char-for-char vs the exec'd reference converter in
tests/test_markdown_golden.py): headings, paragraphs/divs, inline spans,
links (+titles, automatic ``<url>`` links), images, bold/italic with
html2text's stressed-whitespace rules, inline code, ``[code]`` blocks from
<pre>, flat and nested ul/ol, blockquotes (incl. nested — the reference's
``"> " * depth`` opening-chain vs ``">"*depth + " "`` continuation quirk),
tables (non-padded pipe rows + ``---|---`` separator after the first row,
every table line br-suffixed, caption text flowing into the first row),
definition lists (``\\n\\n``-led dt, 4-space-indented dd, dt→dd stressed
carry), br, hr, entity unescaping, and the single-line-break block layout
(lists trailed by a blank pair).

Nested emphasis (b/i in any nesting, incl. the stressed-space rules across
close markers) is covered as of round 3; round 4 closed the residual
combos: tables inside list items (first row concatenates onto the pending
line, remaining rows bare), blockquotes and pre blocks inside list items,
pre/list tails inside (nested) blockquotes mid-document (incl. the
vendored converter's prefix-loss quirk on bare text after an in-quote
list, and the first-content-only blank line before [code]).  The structure
here is a DOM walk over stages/extract.py's tree — not a port of the
reference's streaming parser.
"""

from __future__ import annotations

import re

from ..stages.extract import parse_dom

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCK_TAGS = {
    "html", "body", "p", "div", "section", "article", "header", "footer",
    "nav", "main", "aside", "figure", "figcaption", "ul", "ol", "li",
    "blockquote", "pre", "hr", "table", "dl", "video", "audio",
} | set(_HEADINGS)
_SKIP_TAGS = {"script", "style", "head", "title", "meta", "link"}
_ABS_URL_RE = re.compile(r"^[a-zA-Z+]+://")
_STRESS_SPACE_RE = re.compile(r"[^][(){}\s.!?]")
_WS_RE = re.compile(r"\s+")
_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


def _escape_url(url: str) -> str:
    """html2text escapes parens inside the (url) part of md links."""
    return url.replace("(", r"\(").replace(")", r"\)")


class _Inline:
    """Inline emitter holding html2text's stressed-text state machine:
    text just inside b/i/em/strong is stripped; the next text after one gets
    a leading space unless it starts with punctuation-ish chars or sits in
    a/code/pre (utils: reference html2text/__init__.py:884-896, 425-465)."""

    def __init__(self):
        self.parts: list[str] = []
        self.stressed = False
        self.preceding_stressed = False
        self.preceding_data = ""

    def text(self, data: str, in_code: bool = False, suppress_stress_space: bool = False):
        if data == "":
            return
        if self.stressed:
            data = data.strip()
            self.stressed = False
            self.preceding_stressed = True
        elif self.preceding_stressed:
            if (
                data[:1]
                and _STRESS_SPACE_RE.match(data[0])
                and not suppress_stress_space
            ):
                data = " " + data
            self.preceding_stressed = False
        # the PROCESSED data, not the raw input — the reference assigns
        # after the stressed strip / stress-space prefix (html2text
        # __init__.py:924), and open_em's space-before-marker rule keys off
        # it; raw here loses the space before a nested emphasis marker
        self.preceding_data = data
        collapsed = data if in_code else _WS_RE.sub(" ", data)
        if not self.parts and collapsed.startswith(" "):
            collapsed = collapsed.lstrip(" ")
        self.parts.append(collapsed)

    def marker(self, s: str):
        self.parts.append(s)

    def open_em(self):
        pd = self.preceding_data
        if pd and pd[-1] not in " \t\n\r\x0b\x0c" and pd[-1] not in _PUNCT:
            self.marker(" _")
            self.preceding_data += " "
        else:
            self.marker("_")
        self.stressed = True

    def open_strong(self):
        pd = self.preceding_data
        if pd and pd[-1] == "*":
            self.marker(" **")
            self.preceding_data += " "
        else:
            self.marker("**")
        self.stressed = True

    def result(self) -> str:
        return "".join(self.parts).rstrip()


class MarkdownConverter:
    """DOM-walking converter; ``convert(html) -> str``."""

    def convert(self, html: str) -> str:
        root = parse_dom(html or "")
        blocks: list[tuple[str, str]] = []  # (text, kind)
        self._walk_blocks(root, blocks, list_depth=0)
        return self._join(blocks)

    # ----------------------------------------------------------- block walk
    def _join(self, blocks: list[tuple[str, str]]) -> str:
        out: list[str] = []
        prev = None
        for text, kind in blocks:
            if kind == "dl":
                # html2text's dl-start swallows the pending paragraph break;
                # the block text carries its own "\n\n" when it leads with dt
                pass
            elif prev is not None:
                out.append("\n")
            elif kind == "pre":
                out.append("\n")
            out.append(text)
            if kind == "list":
                out.append("\n\n")
            prev = kind
        if prev is None:
            return "\n"  # html2text: no content still yields one newline
        s = "".join(out)
        if s.endswith("  "):  # the final table row's br suffix is dropped
            s = s[:-2]
        return s + "\n"

    def _walk_blocks(self, node, blocks, list_depth):
        """Walk children: contiguous inline content forms implicit
        paragraphs; block children recurse."""
        inline = _Inline()

        def flush():
            nonlocal inline
            text = inline.result()
            if text:
                blocks.append((text, "normal"))
            inline = _Inline()

        for c in node.children:
            if isinstance(c, str):
                self._inline_node(c, inline, None)
                continue
            if c.tag in _SKIP_TAGS:
                continue
            if c.tag in _BLOCK_TAGS:
                flush()
                self._block_node(c, blocks, list_depth)
            else:
                self._inline_node(c, inline, None)
        flush()

    def _block_node(self, node, blocks, list_depth):
        tag = node.tag
        if tag in _HEADINGS:
            text = self._render_inline(node, in_heading=True)
            if text:
                blocks.append(("#" * _HEADINGS[tag] + " " + text, "normal"))
        elif tag == "hr":
            blocks.append(("* * *", "normal"))
        elif tag == "pre":
            content = self._pre_text(node)
            lines = content.split("\n")
            while lines and lines[-1] == "":
                lines.pop()
            body = "\n".join("    " + ln if ln else "" for ln in lines)
            blocks.append((f"[code]\n{body}\n[/code]", "pre"))
        elif tag in ("ul", "ol"):
            lines: list[str] = []
            self._list_items(node, lines, depth=list_depth)
            if lines:
                kind = "list" if list_depth == 0 else "normal"
                blocks.append(("\n".join(lines), kind))
        elif tag == "li":  # bare li outside a list (html2text: '* x')
            text = self._render_inline(node)
            if text:
                blocks.append(("* " + text, "normal"))
        elif tag == "blockquote":
            lines = self._quote_lines(node, depth=1, chain=True)
            if lines:
                blocks.append(("\n".join(lines), "normal"))
        elif tag == "table":
            text = self._table_block(node)
            if text is not None:
                blocks.append((text, "table"))
        elif tag == "dl":
            text = self._dl_block(node)
            if text:
                blocks.append((text, "dl"))
        else:  # p, div, nav, figure, ... : implicit-paragraph container
            self._walk_blocks(node, blocks, list_depth)

    # ---------------------------------------------------------------- table
    def _table_block(self, node) -> str | None:
        """html2text non-padded table: first row (th or td alike) then a
        ---|--- separator sized to it, cells joined '| ', every line
        br-suffixed ('  ') — the document-final suffix is stripped in
        _join.  Caption text flows straight into the first row line."""
        caption_parts: list[str] = []
        rows: list[list[str]] = []

        def walk(n):
            for c in n.children:
                if isinstance(c, str) or c.tag in _SKIP_TAGS:
                    continue
                if c.tag == "caption":
                    caption_parts.append(self._render_inline(c))
                elif c.tag == "tr":
                    cells = [
                        self._render_inline(cc)
                        for cc in c.children
                        if not isinstance(cc, str) and cc.tag in ("td", "th")
                    ]
                    if cells:
                        rows.append(cells)
                elif c.tag in ("thead", "tbody", "tfoot"):
                    walk(c)

        walk(node)
        if not rows:
            return None
        first = "".join(caption_parts) + "| ".join(rows[0])
        lines = [first, "|".join(["---"] * len(rows[0]))]
        lines.extend("| ".join(r) for r in rows[1:])
        return "  \n".join(lines) + "  "

    # ------------------------------------------------------------------- dl
    def _dl_block(self, node) -> str:
        """html2text dl: every dt is led by a literal '\\n\\n' and trailed
        by '\\n'; every dd is '    ' + inline text with NO trailing newline
        (consecutive dds share a line).  The inline stressed state carries
        across dt→dd (reference state machine never resets it)."""
        parts: list[str] = []
        carry = False
        for c in node.children:
            if isinstance(c, str) or c.tag in _SKIP_TAGS:
                continue
            if c.tag in ("dt", "dd"):
                inline = _Inline()
                inline.preceding_stressed = carry
                if carry:
                    # the carried stressed-space must survive _Inline's
                    # first-part lstrip (it's mid-stream in the reference)
                    inline.parts.append("")
                self._inline_node_children(c, inline)
                text = inline.result()
                carry = inline.preceding_stressed or inline.stressed
                if c.tag == "dt":
                    parts.append("\n\n" + text + "\n")
                else:
                    parts.append("    " + text)
        return "".join(parts)

    # ------------------------------------------------------------ blockquote
    def _quote_lines(self, node, depth: int, chain: bool) -> list[str]:
        """Render a blockquote to prefixed lines.  Reference quirk: a chain
        of quote-opens with no content between them prints '> ' per level
        ('> > > deep'), while every later line at depth d gets '>'*d + ' '
        ('>> continuation')."""
        lines: list[str] = []
        inline = _Inline()
        # after a list inside a quote, the NEXT bare text's first line
        # consumes the list's trailing blank and prints UNPREFIXED (the
        # vendored converter's quote state breaks there — quirk kept)
        pending_list_tail = False

        def pfx() -> str:
            if chain and not lines:
                return "> " * depth
            return ">" * depth + " "

        def flush():
            nonlocal inline, pending_list_tail
            text = inline.result()
            if text:
                parts = text.split("\n")
                if pending_list_tail:
                    if lines and lines[-1] == "":
                        lines.pop()
                    lines.append(parts[0])  # first line bare, rest prefixed
                    parts = parts[1:]
                    pending_list_tail = False
                for ln in parts:
                    lines.append(pfx() + ln)
            inline = _Inline()

        def emit_blocks(child):
            inner: list[tuple[str, str]] = []
            self._block_node(child, inner, 0)
            for text, _k in inner:
                for ln in text.split("\n"):
                    lines.append(pfx() + ln)

        for c in node.children:
            if isinstance(c, str):
                self._inline_node(c, inline, None)
                continue
            if c.tag in _SKIP_TAGS:
                continue
            if c.tag == "blockquote":
                flush()
                pending_list_tail = False
                lines.extend(self._quote_lines(c, depth + 1, chain and not lines))
            elif c.tag in _HEADINGS:
                flush()
                pending_list_tail = False
                text = self._render_inline(c, in_heading=True)
                if text:
                    lines.append(pfx() + "#" * _HEADINGS[c.tag] + " " + text)
            elif c.tag in ("ul", "ol"):
                flush()
                items: list[str] = []
                self._list_items(c, items, depth=0)
                lines.extend(pfx() + ln for ln in items)
                # reference tail: a lone prefixed blank then a blank line
                lines.append(">" * depth + " ")
                lines.append("")
                pending_list_tail = True
            elif c.tag == "pre":
                flush()
                pending_list_tail = False
                content = self._pre_text(c)
                body = content.split("\n")
                while body and body[-1] == "":
                    body.pop()
                if not lines:
                    # the blank quote line appears only when the pre is the
                    # quote's FIRST content (vendored-converter quirk) —
                    # and it takes the opening chain at nested depth
                    lines.append(pfx())
                lines.append("[code]")
                lines.extend(">" * depth + "     " + ln if ln else ">" * depth + " "
                             for ln in body)
                lines.append("[/code]")
            elif c.tag in _BLOCK_TAGS:
                flush()
                pending_list_tail = False
                emit_blocks(c)
            else:
                self._inline_node(c, inline, None)
        flush()
        return lines

    def _list_items(self, node, lines, depth):
        """Render list items.  Block children inside an <li> reproduce the
        vendored converter's quirks (probed shape-for-shape): a table's
        first row CONCATENATES onto the pending line text (item line or a
        later tail line) with the remaining rows as bare unindented lines;
        blockquotes emit their '> ' lines at column 0; pre emits
        '[code]    first-line' joined; any inline text after a block child
        lands on its own bare line; <p>/<div> inline their text then end
        the current line."""
        ordered = node.tag == "ol"
        counter = 0
        for c in node.children:
            if isinstance(c, str) or c.tag != "li":
                continue
            counter += 1
            mark = f"{counter}. " if ordered else "* "

            first_parts: list[str] = []   # the item line's content
            tail_lines: list[str] = []    # bare lines following it
            inline = _Inline()
            on_first = True  # pending text still belongs to the item line

            def close_line(keep_empty_first=False):
                nonlocal inline, on_first
                text = inline.result()
                if on_first:
                    if text or keep_empty_first:
                        first_parts.append(text)
                    on_first = False
                elif text:
                    tail_lines.extend(text.split("\n"))
                inline = _Inline()

            def take_pending() -> str:
                nonlocal inline
                text = inline.result()
                inline = _Inline()
                return text

            for cc in c.children:
                if isinstance(cc, str):
                    self._inline_node(cc, inline, None)
                    continue
                if cc.tag in _SKIP_TAGS:
                    continue
                if cc.tag in ("ul", "ol"):
                    close_line(keep_empty_first=True)
                    self._list_items(cc, tail_lines, depth + 1)
                elif cc.tag == "table":
                    text = self._table_block(cc)
                    if text is None:
                        continue
                    rows = text.split("\n")
                    pend = take_pending()
                    if on_first:
                        first_parts.append(pend + rows[0])
                        on_first = False
                        tail_lines.extend(rows[1:])
                    elif pend:
                        tail_lines.append(pend + rows[0])
                        tail_lines.extend(rows[1:])
                    else:
                        tail_lines.extend(rows)
                elif cc.tag == "blockquote":
                    close_line(keep_empty_first=True)
                    tail_lines.extend(self._quote_lines(cc, depth=1, chain=True))
                elif cc.tag == "pre":
                    close_line(keep_empty_first=True)
                    body = self._pre_text(cc).split("\n")
                    while body and body[-1] == "":
                        body.pop()
                    head = "[code]" + ("    " + body[0] if body else "")
                    tail_lines.append(head)
                    tail_lines.extend(
                        "    " + ln if ln else "" for ln in body[1:]
                    )
                    tail_lines.append("[/code]")
                elif cc.tag in _BLOCK_TAGS:
                    # <p>/<div>/…: text joins the current line, then the
                    # line ends (following content starts a bare line)
                    self._inline_node_children(cc, inline)
                    close_line()
                else:
                    self._inline_node(cc, inline, None)
            close_line()
            item_text = "".join(first_parts)
            if item_text:
                lines.append("  " * (depth + 1) + mark + item_text)
            lines.extend(tail_lines)

    # --------------------------------------------------------------- inline
    def _render_inline(self, node, in_heading: bool = False) -> str:
        inline = _Inline()
        self._inline_node_children(node, inline)
        return inline.result()

    def _inline_node_children(self, node, inline):
        for c in node.children:
            self._inline_node(c, inline, None)

    def _inline_node(self, c, inline, parent_tag):
        if isinstance(c, str):
            inline.text(c)
            return
        tag = c.tag
        if tag in _SKIP_TAGS:
            return
        if tag in ("b", "strong"):
            inline.open_strong()
            self._inline_node_children(c, inline)
            inline.marker("**")
        elif tag in ("i", "em"):
            inline.open_em()
            self._inline_node_children(c, inline)
            inline.marker("_")
        elif tag == "code":
            inline.stressed = False
            if inline.preceding_stressed:
                inline.preceding_stressed = False
            inline.marker("`")
            self._inline_node_children(c, inline)
            inline.marker("`")
        elif tag == "a":
            href = c.get("href")
            sub = _Inline()
            # link text never gets the stressed space (reference rule)
            sub.stressed = inline.stressed
            inline.stressed = False
            inline.preceding_stressed = False
            self._inline_node_children(c, sub)
            text = sub.result()
            if href is None:
                inline.text(text)
            elif text == href and _ABS_URL_RE.match(href):
                inline.marker(f"<{href}>")
            else:
                title = c.get("title")
                suffix = f' "{title}"' if title is not None else ""
                inline.marker(f"[{text}]({_escape_url(href)}{suffix})")
            inline.preceding_data = text or href or ""
        elif tag == "img":
            src = c.get("src")
            if src is None:
                return  # no src, no markdown (reference: src required)
            alt = c.get("alt") or ""
            inline.marker(f"![{alt}]({_escape_url(src)})")
            inline.preceding_data = alt or src
        elif tag == "br":
            inline.marker("  \n")
        else:
            self._inline_node_children(c, inline)

    def _pre_text(self, node) -> str:
        out: list[str] = []
        stack = list(reversed(node.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out).strip("\n")


def html_to_markdown(html: str) -> str:
    """Module-level convenience (stateless; converter is cheap)."""
    return MarkdownConverter().convert(html)
