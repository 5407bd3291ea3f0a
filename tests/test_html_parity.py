"""Parity: the fast regex tag scanner must match stdlib html.parser output.

The product semantics of extract_blocks are defined by the _BlockParser state
machine; _FastBlockParser is a drop-in speedup and must be byte-identical on
every payload the corpus can produce (plus adversarial markup edge cases).
"""

from __future__ import annotations

import re

import pytest

from rayextract.html_extract import (
    MIN_BLOCK_CHARS,
    _BlockParser,
    _FastBlockParser,
    _WS,
    extract_main_content,
)
from rayextract.synth import conversation_rows


def _blocks_via(parser_cls, html: str):
    p = parser_cls()
    try:
        p.feed(html)
        p.close()
    except Exception:
        txt = _WS.sub(" ", re.sub(r"<[^>]+>", " ", html)).strip()
        return [(txt, 0.0, len(txt) >= MIN_BLOCK_CHARS)]
    return [
        (b.text(), b.link_chars, b.order) for b in p.blocks if b.text()
    ]


EDGE_CASES = [
    "",
    "no tags at all",
    "<p>simple paragraph with enough characters to be kept around</p>",
    "<div>a &amp; b &lt;escaped&gt; &#65; &unknown; text</div>",
    "<nav>chrome text</nav><p>body text that is long enough to keep here</p>",
    "<p>text with <a href='x'>a link inside</a> and more words after it</p>",
    "<ul><li>one item</li><li>two item</li></ul>",
    "<script>var x = '<p>not a block</p>';</script><p>real content here okay</p>",
    "<style>p { color: red; }</style><p>styled content body long enough</p>",
    "<!-- comment <p>no</p> --><p>after comment content long enough here</p>",
    "<!DOCTYPE html><html><body><p>doc body content long enough to keep</p></body></html>",
    "<p>unclosed paragraph runs on and on with plenty of characters",
    "<br/><p>self closing break then paragraph with enough text to keep</p>",
    "<p>a < b and c > d compared inline with enough padding text here</p>",
    "<td>cell one</td><th>header two</th><tr><td>row cell three</td></tr>",
    "<P>UPPERCASE TAGS WITH ENOUGH TEXT TO SATISFY THE KEEP THRESHOLD</P>",
    "<p >spaced tag</p ><div  class='x'>attributed div long enough text</div>",
    "<a>link only block</a>",
    "<?xml version='1.0'?><p>after processing instruction long enough text</p>",
    "< notatag <p>then real content with enough characters to keep it</p>",
    "<script>never closed script body <p>swallowed</p>",
    "text &amp; more <p>mixed top-level then block with enough characters</p>",
    # CDATA exit needs the FULL close tag (stdlib r'</\s*tag\s*>'):
    # '</scriptx>' must NOT end the script — 'still code' stays swallowed
    "<script>a</scriptx> still code </script><p>real content after script x</p>",
    "<script>a</script foo>b</script><p>real content after junk endtag</p>",
    "<style>s</ style >t<p>after a spaced style close with enough text</p>",
    "<script>a<!--</script>--><p>comment-lookalike inside script body ok</p>",
    "<p>before</p><script>tail with no close tag is dropped entirely",
    "<STYLE>S</STYLE><p>uppercase style close with enough padding text here</p>",
]


@pytest.mark.parametrize("html", EDGE_CASES)
def test_edge_case_parity(html):
    assert _blocks_via(_FastBlockParser, html) == _blocks_via(_BlockParser, html)


def test_corpus_parity():
    rows = [r for c in range(300) for r in conversation_rows(11, c)]
    n_html = 0
    for r in rows:
        t = r["text"]
        if t.lstrip().startswith("<"):
            n_html += 1
            assert _blocks_via(_FastBlockParser, t) == _blocks_via(_BlockParser, t), t[:200]
    assert n_html > 50  # the corpus must actually exercise the html path


def test_extract_main_content_smoke():
    html = (
        "<nav>menu menu menu</nav>"
        "<p>This is the long main content paragraph that should be kept.</p>"
        "<footer>copyright</footer>"
    )
    out = extract_main_content(html)
    assert "main content" in out
    assert "menu" not in out and "copyright" not in out
