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
