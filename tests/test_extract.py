"""Extract-stage unit tests: links (first-wins dedup), image scoring,
metadata fallbacks, and the interleaved span traversal."""

import pyarrow as pa

from crawl4ai_ray.stages.extract import (
    IMAGE_SCORE_THRESHOLD,
    extract_batch,
    extract_page,
    parse_dom,
    parse_srcset,
    score_image,
)

PAGE = """
<html><head>
  <title>My Page</title>
  <meta name="keywords" content="a,b">
  <meta property="og:description" content="og desc">
</head><body>
  <nav>Home &gt; Sub</nav>
  <h1>Heading</h1>
  <p>First   paragraph
     with   wrapped text.</p>
  <figure><img src="http://x.com/img/big.jpg" alt="Big" width="400" height="300"></figure>
  <p>Second paragraph with <a href="/a?utm_source=z">inline link</a> inside.</p>
  <img src="http://x.com/icons/icon-small.png" alt="">
  <video src="http://x.com/v.mp4"></video>
  <ul>
    <li><a href="/a">A link</a></li>
    <li><a href="/b#frag" title="B">B link</a></li>
    <li><a href="http://other.org/c">External</a></li>
    <li><a href="mailto:x@y.com">mail</a></li>
  </ul>
</body></html>
"""


def test_metadata():
    page = extract_page(PAGE, "http://x.com/page")
    assert page["metadata"]["title"] == "My Page"
    assert page["metadata"]["description"] == "og desc"  # og fallback
    assert page["metadata"]["keywords"] == "a,b"


def test_links_first_wins_and_split():
    page = extract_page(PAGE, "http://x.com/page")
    internal = {l["href"]: l for l in page["internal_links"]}
    # /a?utm_source=z and /a normalize to the same href; first wins (inline link)
    assert "http://x.com/a" in internal
    assert internal["http://x.com/a"]["text"] == "inline link"
    assert internal["http://x.com/b"]["title"] == "B"
    ext = {l["href"] for l in page["external_links"]}
    assert "http://other.org/c" in ext
    assert "mailto:x@y.com" in ext  # special protocols are "external"
    # link_pos is the document-order anchor index
    assert internal["http://x.com/a"]["link_pos"] == 0


def test_image_scoring():
    page = extract_page(PAGE, "http://x.com/page")
    srcs = [i["src"] for i in page["media"]["images"]]
    assert "http://x.com/img/big.jpg" in srcs  # width+height+alt+format+early
    assert all("icon" not in s for s in srcs)  # icon rejected
    big = next(i for i in page["media"]["images"] if i["src"].endswith("big.jpg"))
    assert big["score"] > IMAGE_SCORE_THRESHOLD
    assert big["format"] == "jpg"


def test_spans_interleaving():
    page = extract_page(PAGE, "http://x.com/page")
    spans = page["spans"]
    kinds = [s["kind"] for s in spans]
    texts = [s["text"] for s in spans]
    assert texts[0] == "Home > Sub"
    assert texts[1] == "Heading"
    assert texts[2] == "First paragraph with wrapped text."  # whitespace collapsed
    assert kinds[3] == "image" and spans[3]["media_ref"] == "http://x.com/img/big.jpg"
    assert texts[4] == "Second paragraph with inline link inside."
    # icon img has src → still a media span (spans carry ALL media refs)
    assert kinds[5] == "image" and "icon" in spans[5]["media_ref"]
    assert kinds[6] == "video" and spans[6]["media_ref"] == "http://x.com/v.mp4"
    # offsets are the 0-based document-order index
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    # li texts are separate spans
    assert "A link" in texts and "B link" in texts


def test_srcset_parse():
    assert parse_srcset("a.jpg 100w, b.jpg 200w") == [
        {"url": "a.jpg", "width": "100"},
        {"url": "b.jpg", "width": "200"},
    ]


def test_score_image_rejections():
    root = parse_dom('<button><img src="x.jpg"></button>')
    img = next(n for n in root.iter() if n.tag == "img")
    assert score_image(img, 0, 1)[0] == -1
    root = parse_dom('<div class="logo-box"><img src="x.jpg"></div>')
    img = next(n for n in root.iter() if n.tag == "img")
    assert score_image(img, 0, 1)[0] == -1
    root = parse_dom('<div><img src="x.jpg" style="display:none"></div>')
    img = next(n for n in root.iter() if n.tag == "img")
    assert score_image(img, 0, 1)[0] == -1


def test_extract_batch_arrow():
    batch = pa.table(
        {
            "url": ["http://x.com/page", "http://x.com/404"],
            "html": [PAGE, ""],
            "success": [True, False],
        }
    )
    out = extract_batch(batch)
    assert "html" not in out.column_names
    spans = out.column("spans").to_pylist()
    assert len(spans[0]) > 5 and spans[1] == []
    links = out.column("links").to_pylist()
    assert any(l["internal"] for l in links[0])
    assert out.column("title").to_pylist() == ["My Page", ""]


# ------------------------------------------------------- parser backends
def test_parser_backend_selection(monkeypatch):
    """Availability-selected backend: stdlib in this container (lxml absent),
    lxml when importable, env override always wins."""
    from crawl4ai_ray.stages import extract as ex

    monkeypatch.delenv("GRAFT_PARSER_BACKEND", raising=False)
    assert ex._parser_backend() == ("lxml" if ex.HAVE_LXML else "stdlib")
    monkeypatch.setenv("GRAFT_PARSER_BACKEND", "stdlib")
    assert ex._parser_backend() == "stdlib"


def test_parser_backends_agree():
    """When lxml is present, both backends must produce identical extraction
    results over a representative page (spans, links, media, metadata)."""
    from crawl4ai_ray.stages import extract as ex

    if not ex.HAVE_LXML:
        import pytest

        pytest.skip("lxml not installed — stdlib backend is the CI path")
    import os

    from crawl4ai_ray.sources.corpus import CorpusParams, synthesize_html

    page = synthesize_html(CorpusParams(n_hosts=1, pages_per_host=30, seed=9), 0, 4)
    results = {}
    for backend in ("stdlib", "lxml"):
        os.environ["GRAFT_PARSER_BACKEND"] = backend
        try:
            results[backend] = ex.extract_page(page, "http://site0.test/p/4")
        finally:
            del os.environ["GRAFT_PARSER_BACKEND"]
    assert results["stdlib"] == results["lxml"]


def test_lxml_tree_conversion_shape():
    """_convert_lxml_tree is exercised with ElementTree (same .text/.tail/
    .attrib API as lxml) so the conversion logic has real CI coverage even
    though lxml itself is absent: interleaved string children, lowercase
    tags, index registration, comment skipping with tail preservation."""
    import xml.etree.ElementTree as ET

    from crawl4ai_ray.stages import extract as ex

    xhtml = (
        '<html><body><p>a<b>bold</b>tail<!--c-->after</p>'
        '<a href="http://x/">L</a><img src="http://x/i.png"/></body></html>'
    )
    # insert_comments=True mirrors lxml: comments appear as children with a
    # non-str tag and carry the following text in .tail
    parser = ET.XMLParser(target=ET.TreeBuilder(insert_comments=True))
    index = {t: [] for t in ex._INDEXED_TAGS}
    root = ex.Node("#root", {}, None)
    sub = ex._convert_lxml_tree(ET.fromstring(xhtml, parser=parser), root, index)
    root.children.append(sub)
    body = sub.children[0]
    p = body.children[0]
    assert [c if isinstance(c, str) else c.tag for c in p.children] == [
        "a", "b", "tail", "after"
    ]
    assert [n.get("href") for n in index["a"]] == ["http://x/"]
    assert [n.get("src") for n in index["img"]] == ["http://x/i.png"]
    assert p.text_content() == "aboldtailafter"


def test_fast_format_html_parity():
    """Char-exact vs the exec'd reference utils.fast_format_html (the
    function is dependency-free, so it's ast-extracted and exec'd from the
    reference file) over synthetic pages and a quirk grid."""
    import ast
    import os

    import pytest

    ref_file = "/root/reference/crawl4ai/utils.py"
    if not os.path.exists(ref_file):
        pytest.skip("reference not present")
    tree = ast.parse(open(ref_file).read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "fast_format_html")
    ns: dict = {}
    exec(compile(ast.Module([fn], type_ignores=[]), ref_file, "exec"), ns)
    ref_fmt = ns["fast_format_html"]

    from crawl4ai_ray.functions.format_html import fast_format_html
    from crawl4ai_ray.sources.corpus import CorpusParams, synthesize_html

    params = CorpusParams(n_hosts=1, pages_per_host=30, seed=13)
    for p in range(1, 12):
        page = synthesize_html(params, 0, p)
        assert fast_format_html(page) == ref_fmt(page), p
    quirks = [
        "<div><p>a</p><br><p>b</p></div>",          # void tag indents (quirk)
        "<img src='x'/><div>t</div>",                # self-closing
        "<div>a < b</div>",                          # stray < in text
        "<div>\n  line1\n  line2\n</div>",           # multi-line text
        "<div\nclass='x'>t</div>",                   # tag broken across lines
        "", "   ", "<p>only</p>",
    ]
    for q in quirks:
        assert fast_format_html(q) == ref_fmt(q), repr(q)
