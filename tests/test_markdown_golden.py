"""Markdown-fidelity goldens: html_to_markdown must match the reference's
CustomHTML2Text configuration (body_width=0, single_line_break=True,
mark_code=True — markdown_generation_strategy.py:181-200) char-for-char on
the covered feature slice.  Two layers:

  * hardcoded goldens (always run, no reference needed);
  * exec-the-reference-converter parity over the feature grid AND full
    synthetic corpus pages (runs when /root/reference is present).
"""

import os

import pytest

from crawl4ai_ray.functions.markdown_gen import html_to_markdown

GOLDENS = [
    ("<h1>Title</h1><p>Hello <b>bold</b> and <em>it</em>.</p>",
     "# Title\nHello **bold** and _it_.\n"),
    ('<p><a href="http://x/a" title="T">link</a></p>', '[link](http://x/a "T")\n'),
    ("<a href='http://x/a'>http://x/a</a>", "<http://x/a>\n"),
    ('<p><img src="http://x/i.jpg" alt="A"></p>', "![A](http://x/i.jpg)\n"),
    ("<p>code <code>inline()</code> here</p>", "code `inline()` here\n"),
    ("<pre><code>x = 1\ny = 2</code></pre>", "\n[code]\n    x = 1\n    y = 2\n[/code]\n"),
    ("<ul><li>a</li><li>b</li></ul><p>after</p>", "  * a\n  * b\n\n\nafter\n"),
    ("<ol><li>a</li><li>b</li></ol>", "  1. a\n  2. b\n\n\n"),
    ("<ul><li>a<ul><li>n1</li></ul></li></ul>", "  * a\n    * n1\n\n\n"),
    ("<blockquote><p>p1</p><p>p2</p></blockquote>", "> p1\n> p2\n"),
    ("<p>line1<br>line2</p>", "line1  \nline2\n"),
    ("<hr>", "* * *\n"),
    ("<p><strong>s</strong><em>e</em></p>", "**s** _e_\n"),  # stressed-space rule
    ("<p>a<b> spaced </b>b</p>", "a**spaced** b\n"),
    ("<p><b>a</b>x</p>", "**a** x\n"),
    ("<p><b>a</b>.</p>", "**a**.\n"),
    ("<p><b>a</b><code>c</code></p>", "**a**`c`\n"),
    ("<p>&amp; &lt; &gt; &quot; &#65;</p>", '& < > " A\n'),
    ('<p><a href="/j">t</a> <a href="javascript:void(0)">js</a></p>',
     "[t](/j) [js](javascript:void\\(0\\))\n"),
    ("", "\n"),
    # tables — html2text non-padded style: first row + ---|--- separator,
    # every table line br-suffixed except the document-final one
    ("<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>",
     "A| B  \n---|---  \n1| 2\n"),
    ("<p>before</p><table><tr><td>only</td></tr></table><p>after</p>",
     "before\nonly  \n---  \nafter\n"),
    ("<table><tr><td>r1c1</td></tr><tr><td>r2c1</td><td>r2c2</td></tr></table>",
     "r1c1  \n---  \nr2c1| r2c2\n"),
    ("<table><caption>Cap</caption><tr><td>x</td></tr></table>", "Capx  \n---\n"),
    ("<table></table>", "\n"),
    # definition lists — dt led by a literal blank pair, dd indented 4,
    # stressed state carrying dt→dd
    ("<dl><dt>Term</dt><dd>Definition</dd><dt>T2</dt><dd>D2</dd></dl>",
     "\n\nTerm\n    Definition\n\nT2\n    D2\n"),
    ("<p>p</p><dl><dt>Term</dt><dd>Def</dd></dl><p>q</p>", "p\n\nTerm\n    Def\nq\n"),
    ("<dl><dt><b>T</b></dt><dd>D</dd></dl>", "\n\n**T**\n     D\n"),
    ("<dl><dd>lonely dd</dd></dl>", "    lonely dd\n"),
    # nested blockquotes — '> ' per level on an opening chain,
    # '>'*depth + ' ' on continuations
    ("<blockquote>outer<blockquote>inner</blockquote>tail</blockquote>",
     "> outer\n>> inner\n> tail\n"),
    ("<blockquote><blockquote><blockquote>deep</blockquote></blockquote></blockquote>",
     "> > > deep\n"),
    ("<blockquote><blockquote><p>a</p><p>b</p></blockquote></blockquote>",
     "> > a\n>> b\n"),
    ("<blockquote><blockquote>in</blockquote><p>after</p></blockquote>",
     "> > in\n> after\n"),
    ("<blockquote>a<br>b</blockquote>", "> a  \n> b\n"),
    ("<blockquote><h2>H</h2>text</blockquote>", "> ## H\n> text\n"),
]

# exec-parity only (no hardcoded golden): quirky shapes worth pinning to the
# reference but not worth hand-maintaining expected strings for
PARITY_EXTRA = [
    # nested emphasis — preceding_data must track the PROCESSED text and
    # close markers must not touch preceding_stressed (it persists to the
    # next data node, reference html2text/__init__.py:884-896,924)
    "<p><b>bold <i>both</i></b></p>",
    "<p><i>it <b>bb</b> tail</i></p>",
    "<p>pre <b>bold <i>mid</i> tail</b> post</p>",
    "<p><em>a<strong>b</strong>c</em></p>",
    "<p><strong>only<b>double</b></strong></p>",
    "<p>a <b> spaced <i> inner </i> out </b> z</p>",
    "<p><b><i></i></b>deep-empty</p>",
    "<p><i>i <b>b</b> </i>tail</p>",
    "<p><b>deep <i>in <b>most</b></i></b></p>",
    "<p><b>x</b>y</p>",
    "<p><b>x </b>y</p>",
    "<p><i>a<b>b</b></i>c</p>",
    "<p><b>x</b>.y</p>",
    "<p><b>x</b><i>y</i>z</p>",
    "<p><b>link <a href='http://e.com/'>text</a></b> after</p>",
    "<p><i>code <code>x</code></i> t</p>",
    "<p><b>img <img src='http://e/i.png' alt='a'></b> t</p>",
    "<table><thead><tr><th>Name</th><th>Qty</th></tr></thead><tbody>"
    "<tr><td>apple</td><td>3</td></tr><tr><td>pear with space</td><td>12</td></tr>"
    "</tbody></table>",
    "<table><tr><td></td><td>x</td></tr><tr><td>a</td><td></td></tr></table>",
    "<table><tr><th>A</th><th>B</th><th>C</th></tr><tr><td>1</td><td>2</td></tr></table>",
    "<table><tr></tr></table>",
    "<h2>H</h2><table><tr><th>A</th></tr><tr><td>1</td></tr><tr><td>2</td></tr></table>",
    "<table><tr><td><a href='http://x/'>l</a></td>"
    "<td><img src='http://x/i.png' alt='A'></td></tr></table>",
    "<table><tbody><tr><td>single</td></tr></tbody></table>",
    "<table><tr><td>a</td></tr></table><table><tr><td>b</td></tr></table>",
    "<table><tr><td>a</td><td><b>bold</b></td></tr></table>",
    "<dl><dt>T1</dt><dt>T2</dt><dd>D</dd><dd>D2</dd></dl>",
    "<dl><dt>T</dt><dd>D</dd></dl><dl><dt>U</dt><dd>E</dd></dl>",
    "<blockquote><p>a</p><blockquote><p>b</p></blockquote></blockquote>",
    "<p>x</p><blockquote><blockquote>deep</blockquote></blockquote>",
    "<blockquote><p>lead</p><blockquote>in</blockquote></blockquote>",
    "<blockquote><pre>x=1</pre></blockquote>",
    "<blockquote>a<ul><li>x</li></ul></blockquote>",
    "<blockquote>text <b>bold</b> tail</blockquote>",
    # round-4 residual combos (the round-3 verdict's item #8): tables
    # inside list items, pre/list tails inside (nested) blockquotes
    # mid-document, blockquotes inside list items — each probed
    # shape-for-shape against the vendored converter
    "<ul><li>item<table><tr><td>a</td><td>b</td></tr></table></li></ul>",
    "<ul><li>x<table><tr><th>H</th></tr><tr><td>1</td></tr></table>tail</li><li>y</li></ul>",
    "<ol><li>n<table><tr><td>c</td></tr></table></li></ol>",
    "<blockquote><pre>x=1</pre><p>after</p></blockquote>",
    "<blockquote><blockquote><pre>x=1\ny=2</pre></blockquote>mid</blockquote>",
    "<blockquote><ul><li>a</li><li>b</li></ul>tail</blockquote>",
    "<blockquote><blockquote><ul><li>a</li></ul></blockquote>tail</blockquote>",
    "<blockquote>lead<ul><li>a</li></ul><p>mid</p><pre>z</pre>end</blockquote>",
    "<ul><li>a<blockquote>q</blockquote>t</li></ul>",
    "<blockquote>txt<pre>z</pre></blockquote>",
    "<blockquote><h2>H</h2><pre>z</pre></blockquote>",
    "<blockquote><ul><li>a</li></ul><pre>z</pre></blockquote>",
    "<blockquote><pre>a</pre><pre>b</pre></blockquote>",
    "<blockquote><ul><li>a</li></ul><blockquote>q</blockquote></blockquote>",
    "<blockquote><ul><li>a</li></ul><ul><li>b</li></ul></blockquote>",
    "<blockquote><ul><li>a</li></ul>t1<p>p1</p></blockquote>",
    "<blockquote><ul><li>a</li></ul>t1<blockquote>q</blockquote></blockquote>",
    "<ul><li>a<pre>z</pre>t</li></ul>",
    "<ul><li><table><tr><td>c</td></tr></table></li></ul>",
    "<ul><li>x<table><tr><td>c</td></tr></table></li><li>y<blockquote>q</blockquote>z</li></ul>",
    "<ol><li>a<ol><li>b<table><tr><td>t</td></tr></table></li></ol>c</li></ol>",
    "<blockquote><table><tr><td>c</td><td>d</td></tr></table>t</blockquote>",
    "<ul><li>a<table><caption>C</caption><tr><td>x</td></tr></table></li></ul>",
    "<ul><li>a<pre>x=1\ny=2</pre>t</li></ul>",
    "<ul><li>a<blockquote>q</blockquote><table><tr><td>c</td></tr></table></li></ul>",
    "<ul><li>a<table><tr><td>c</td></tr></table><table><tr><td>d</td></tr></table></li></ul>",
    "<ul><li><p>para</p>t<table><tr><td>c</td></tr></table></li></ul>",
    "<ul><li>a<table><tr><td>c</td></tr><tr><td>d</td></tr></table>t<b>b</b></li></ul>",
    "<blockquote><ul><li>a</li></ul>t1 t2<br>t3</blockquote>",
    "<blockquote><ol><li>o</li></ol>end</blockquote>",
]


@pytest.mark.parametrize("html,want", GOLDENS, ids=range(len(GOLDENS)))
def test_markdown_goldens(html, want):
    assert html_to_markdown(html) == want


REF = "/root/reference/crawl4ai"


@pytest.fixture(scope="module")
def ref_convert():
    if not os.path.isdir(f"{REF}/html2text"):
        pytest.skip("reference not present")
    # pre-import every stdlib module the vendored package touches, so the
    # reference dir's types.py doesn't shadow stdlib `types` mid-import
    import contextlib  # noqa: F401
    import enum  # noqa: F401
    import functools  # noqa: F401
    import html.entities  # noqa: F401
    import sys
    import urllib.parse  # noqa: F401

    sys.path.insert(0, REF)
    try:
        import html2text as ref_html2text
    finally:
        sys.path.remove(REF)

    def _conv(s: str) -> str:
        h = ref_html2text.HTML2Text()
        h.body_width = 0
        h.single_line_break = True
        h.mark_code = True
        return h.handle(s)

    return _conv


def test_markdown_parity_feature_grid(ref_convert):
    for html, _want in GOLDENS:
        assert html_to_markdown(html) == ref_convert(html), html
    for html in PARITY_EXTRA:
        assert html_to_markdown(html) == ref_convert(html), html


def test_markdown_parity_synthetic_pages(ref_convert):
    from crawl4ai_ray.sources.corpus import CorpusParams, synthesize_html

    params = CorpusParams(n_hosts=2, pages_per_host=40, seed=42)
    for h in range(2):
        for p in range(1, 25):
            page = synthesize_html(params, h, p)
            assert html_to_markdown(page) == ref_convert(page), (h, p)


def test_generate_markdown_result_fields():
    """MarkdownGenerationResult parity shape: citations rewrite into ⟨n⟩
    with a references section, fit_markdown derives from the filtered
    blocks wrapped in <div>s (markdown_generation_strategy.py:230-250)."""
    from crawl4ai_ray.functions.content_filter import PruningContentFilter
    from crawl4ai_ray.functions.markdown import generate_markdown
    from crawl4ai_ray.sources.corpus import CorpusParams, synthesize_html

    page = synthesize_html(CorpusParams(n_hosts=1, pages_per_host=20, seed=5), 0, 3)
    r = generate_markdown(page, "http://site0.test/p/3", PruningContentFilter(0.3))
    assert r["raw_markdown"].startswith("Home >")
    assert "⟨1⟩" in r["markdown_with_citations"]
    assert r["references_markdown"].startswith("\n\n## References")
    assert r["fit_html"].startswith("<div>") and r["fit_markdown"].strip()
    # no filter → fit fields empty, citations off → raw passthrough
    r2 = generate_markdown(page, citations=False)
    assert r2["fit_markdown"] == "" and r2["markdown_with_citations"] == r2["raw_markdown"]


# ------------------------------------------------------- seeded DOM fuzz
# round-5 verdict item #7: the combo grid is closed; harden with a seeded
# random-DOM generator (nesting depth ≤ 4 over the supported tag set)
# asserting char-exact parity against the exec'd reference converter.

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
          "iota", "kappa", "x1", "y2", "z3", "due", "core", "mass"]
_FUZZ_MAX_DEPTH = 4


def _f_text(rng, n_max=5):
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, n_max)))


def _f_inline(rng, depth):
    r = rng.random()
    if depth >= _FUZZ_MAX_DEPTH or r < 0.45:
        return _f_text(rng)
    if r < 0.55:
        return f"<b>{_f_inline(rng, depth + 1)}</b>"
    if r < 0.65:
        return f"<i>{_f_inline(rng, depth + 1)}</i>"
    if r < 0.72:
        return f"<em>{_f_inline(rng, depth + 1)}</em>"
    if r < 0.79:
        return f"<strong>{_f_inline(rng, depth + 1)}</strong>"
    if r < 0.86:
        return f"<code>{_f_text(rng)}</code>"
    if r < 0.93:
        t = _f_text(rng, 2)
        return f'<a href="http://x.test/{rng.randint(0, 99)}">{t}</a>'
    if r < 0.97:
        return f'<img src="http://x.test/i{rng.randint(0, 99)}.jpg" alt="{_f_text(rng, 2)}">'
    return f"{_f_text(rng, 2)}<br>{_f_text(rng, 2)}"


def _f_inline_run(rng, depth):
    return " ".join(_f_inline(rng, depth) for _ in range(rng.randint(1, 3)))


def _f_list(rng, depth, ordered):
    tag = "ol" if ordered else "ul"
    items = []
    for _ in range(rng.randint(1, 3)):
        inner = _f_inline_run(rng, depth + 1)
        if depth + 1 < _FUZZ_MAX_DEPTH and rng.random() < 0.3:
            inner += _f_list(rng, depth + 1, rng.random() < 0.5)
        items.append(f"<li>{inner}</li>")
    return f"<{tag}>{''.join(items)}</{tag}>"


def _f_block(rng, depth):
    r = rng.random()
    if r < 0.3:
        return f"<p>{_f_inline_run(rng, depth)}</p>"
    if r < 0.4:
        lvl = rng.randint(1, 4)
        return f"<h{lvl}>{_f_inline(rng, depth + 1)}</h{lvl}>"
    if r < 0.55:
        return _f_list(rng, depth, rng.random() < 0.5)
    if r < 0.7:
        inner = _f_block(rng, depth + 1) if (
            depth + 1 < _FUZZ_MAX_DEPTH and rng.random() < 0.5
        ) else _f_inline_run(rng, depth + 1)
        return f"<blockquote>{inner}</blockquote>"
    if r < 0.78:
        lines = "\n".join(_f_text(rng) for _ in range(rng.randint(1, 3)))
        return f"<pre><code>{lines}</code></pre>"
    if r < 0.86:
        rows = []
        ncols = rng.randint(1, 3)
        for ri in range(rng.randint(1, 3)):
            cell = "th" if ri == 0 and rng.random() < 0.5 else "td"
            cells = "".join(
                f"<{cell}>{_f_text(rng, 2)}</{cell}>" for _ in range(ncols)
            )
            rows.append(f"<tr>{cells}</tr>")
        return f"<table>{''.join(rows)}</table>"
    if r < 0.92:
        pairs = "".join(
            f"<dt>{_f_text(rng, 2)}</dt><dd>{_f_inline_run(rng, depth + 1)}</dd>"
            for _ in range(rng.randint(1, 2))
        )
        return f"<dl>{pairs}</dl>"
    if r < 0.96:
        return "<hr>"
    return _f_inline_run(rng, depth)  # bare top-level inline content


def _f_doc(rng):
    return "".join(_f_block(rng, 0) for _ in range(rng.randint(1, 6)))


def test_markdown_parity_fuzz_random_dom(ref_convert):
    """300 seeded random documents, char-exact parity with the exec'd
    reference converter.  Any divergence is either a converter bug to fix
    or a reference quirk to pin explicitly in GOLDENS/PARITY_EXTRA."""
    import random

    rng = random.Random(20260818)
    for i in range(300):
        html = _f_doc(rng)
        assert html_to_markdown(html) == ref_convert(html), (i, html)


_NASTY = ["a*b", "x_y", "1.", "2. x", "-", "- y", "+", "+ z", "\\", "\\*lit",
          "[br]", "(par)", "#tag", "`tick`", "~t~", "a  b", " lead", "trail ",
          "5 . 6", "dot.", "e!", "q?", "&", "<", ">", '"q"', "a\nb"]


def test_markdown_parity_fuzz_nasty_chars(ref_convert):
    """Markdown-sensitive characters (escape rules, whitespace collapse,
    entity boundaries) across block shapes — char-exact vs the reference."""
    import html as _h
    import random

    rng = random.Random(7)
    for i in range(250):
        words = [rng.choice(_NASTY + _WORDS) for _ in range(rng.randint(1, 6))]
        esc = _h.escape(" ".join(words))
        shapes = [
            f"<p>{esc}</p>", f"<b>{esc}</b>", f"<blockquote>{esc}</blockquote>",
            f"<ul><li>{esc}</li></ul>", f"<pre><code>{esc}</code></pre>",
            f"<p><code>{esc}</code></p>", f"<h2>{esc}</h2>",
            f'<p><a href="http://x/{i}">{esc}</a></p>',
            f"<p>{esc}<em>{esc}</em></p>",
            f"<table><tr><td>{esc}</td></tr></table>",
        ]
        doc = "".join(rng.sample(shapes, rng.randint(1, 3)))
        assert html_to_markdown(doc) == ref_convert(doc), (i, doc)
