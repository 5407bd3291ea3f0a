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
    # quote-in-tag-name / junk start tags: stdlib parse_starttag semantics
    # (the old hand-rolled _TAG regex diverged on these — r4 fix)
    '<a"b c">linked text here</a> plus more content after the link end',
    '<a"b c=">x</a> trailing text that is long enough to matter here',
    '<div "just quotes">content here long enough to keep around ok</div>',
    '<aaa"x y">text</aaa>',
    "<a",
    '<a href="x',
    "<p/",
    "<p a=b",
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


# --- fast-path (bulk-split) parity: goes THROUGH extract_blocks -------------
# The _simple_blocks fast path was previously untested end-to-end (r3 ADVICE):
# these tests pin (a) byte-identical output vs the general scanner for every
# eligible doc, (b) linear-time eligibility rejection (the old backtracking
# gate was exponential on ineligible docs), (c) that the corpus actually
# exercises the fast path.

import random
import time

from rayextract.html_extract import (
    MAX_LINK_DENSITY,
    _simple_blocks,
    extract_blocks,
)


def _general_extract(html: str):
    """extract_blocks' general-scanner branch, verbatim (the semantics)."""
    p = _FastBlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        txt = _WS.sub(" ", re.sub(r"<[^>]+>", " ", html)).strip()
        return [(txt, 0.0, len(txt) >= MIN_BLOCK_CHARS)]
    out = []
    for b in p.blocks:
        t = b.text()
        if not t:
            continue
        ld = b.link_chars / max(1, len(t))
        out.append((t, ld, len(t) >= MIN_BLOCK_CHARS and ld <= MAX_LINK_DENSITY))
    return out


@pytest.mark.parametrize("html", EDGE_CASES)
def test_fast_path_parity_edge_cases(html):
    # end-to-end: whatever path extract_blocks picks must equal the scanner
    assert extract_blocks(html) == _general_extract(html)


def test_fast_path_parity_corpus():
    from rayextract.html_extract import looks_like_html

    rows = [r for c in range(300) for r in conversation_rows(11, c)]
    n_html = n_fast = 0
    for r in rows:
        t = r["text"]
        if not t.lstrip().startswith("<"):
            continue
        # parity holds for anything '<'-leading (incl. <<x:..>> pdf payloads)
        assert extract_blocks(t) == _general_extract(t), t[:200]
        if looks_like_html(t):  # the pipeline's actual HTML routing gate
            n_html += 1
            if _simple_blocks(t) is not None:
                n_fast += 1
    assert n_html > 50
    # the fast path must actually fire on the corpus, else the gate regressed
    assert n_fast / n_html > 0.9, (n_fast, n_html)


_FUZZ_ATOMS = [
    "plain text ", "with & entity &amp; ", "<p>", "</p>", "<div class='x'>",
    "</div>", "<a href=\"y\">", "</a>", "<br/>", "<nav>", "</nav>",
    "<li >", "</li>", "<span data-k=\"v w\">", "</span>",
    # ineligible constructs — must route to the general scanner, fast:
    "<!-- comment <p>no</p> -->", "<!DOCTYPE html>", "<?xml version='1.0'?>",
    "< notatag", "<p", "<script>var x='<p>';</script>", "<style>p{}</style>",
    "stray > bracket ", "<a\"b c\">", "</p junk>", "<1bad>", "\x00",
    "unterminated <a href='", "<p\t\nwrapped='attr'>",
]


def test_fast_path_parity_fuzz():
    rng = random.Random(0xE11)
    t0 = time.monotonic()
    for _ in range(800):
        doc = "".join(rng.choices(_FUZZ_ATOMS, k=rng.randint(1, 30)))
        # fast-path vs general scanner (extract_blocks picks the path)
        assert extract_blocks(doc) == _general_extract(doc), doc[:200]
        # general scanner vs stdlib html.parser (the semantics reference)
        assert _blocks_via(_FastBlockParser, doc) == _blocks_via(
            _BlockParser, doc
        ), doc[:200]
    # wall bound: 800 fuzz docs (many ineligible) must not hit backtracking
    assert time.monotonic() - t0 < 20.0


def test_gate_linear_on_pathological():
    # each of these hung (exponential) under the old backtracking gate
    pathological = [
        "a" * 100_000 + "<!",
        "x" * 50_000 + "<!-- comment -->" + "y" * 50_000,
        "<p>" + "a" * 100_000 + "<!DOCTYPE html>",
        "<a" + "x" * 100_000,
        "word " * 20_000 + "<? pi",
    ]
    for doc in pathological:
        t0 = time.monotonic()
        out = extract_blocks(doc)
        assert time.monotonic() - t0 < 2.0, doc[:40]
        assert out == _general_extract(doc)


def test_synth_page_main_content_oracle_mirror():
    """html_main_content's driver contract: the batch fn's output equals the
    keep-rule reconstruction (paragraphs of 20 tokens kept iff >= 25 chars;
    the mixed link paragraph always kept; chrome and the link farm always
    gone) for adversarial payloads incl. entities and angle brackets."""
    import pyarrow as pa

    from rayextract.html_extract import main_content_batch

    texts = [
        "",                                   # no paragraphs at all
        "tiny",                               # one short para -> dropped
        "a &amp; b <tag> c \"q\" d",          # escape round-trip, dropped (<25)
        " ".join(f"w{i}" for i in range(55)),  # 3 paras: 20/20/15 tokens
        "x" * 30,                             # single long token para -> kept
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = main_content_batch(t).to_pydict()
    for i, text in enumerate(texts):
        toks = text.split()
        paras = [" ".join(toks[j:j + 20]) for j in range(0, len(toks), 20)]
        kept = [p for p in paras if len(p) >= 25]
        tail = (f"related reading for document {i:08d} item {i % 100}: "
                "see more here details")
        assert out["main_text"][i] == "\n".join(kept + [tail])
        assert out["n_blocks"][i] == len(paras) + 2
        assert out["n_kept"][i] == len(kept) + 1
