"""Property fuzz: vectorized kernels == scalar reference semantics.

The north-rule invariant is byte-exact per-turn text equality, which rests on
three pairs staying identical on ANY input: the RE2-fast-path/Python-fallback
split in textnorm, the regex tag scanner vs the stdlib HTML parser, and the
date grammar's first-match. Hypothesis hunts the corners (unicode categories,
nulls, pathological markup) the corpus never produces.
"""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rayextract.html_extract import _BlockParser, _FastBlockParser, _WS, MIN_BLOCK_CHARS
from rayextract.textnorm import (
    remove_special_array,
    remove_special_characters,
    upper_invariant,
    upper_invariant_array,
)

# text including non-ASCII, combining marks, odd whitespace, ß-class chars
TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0xA0, max_codepoint=0x2FF),
        st.sampled_from("ßßﬁŉ \t\n\r  ıİ$#|/.,()"),
    ),
    max_size=80,
)


@settings(max_examples=120, deadline=None)
@given(st.lists(TEXT, max_size=20))
def test_remove_special_array_matches_scalar(rows):
    arr = pa.array(rows, pa.string())
    got = remove_special_array(arr).to_pylist()
    want = [remove_special_characters(s) for s in rows]
    assert got == want


@settings(max_examples=120, deadline=None)
@given(st.lists(TEXT, max_size=20))
def test_upper_invariant_array_matches_scalar(rows):
    arr = pa.array(rows, pa.string())
    got = upper_invariant_array(arr).to_pylist()
    want = [upper_invariant(s) for s in rows]
    assert got == want


def test_array_kernels_pass_through_nulls():
    arr = pa.array(["a", None, "b(c)!"], pa.string())
    assert remove_special_array(arr).to_pylist() == ["a", None, "b(c)"]
    assert upper_invariant_array(arr).to_pylist() == ["A", None, "B(C)!"]


# tag soup: text fragments + random tags + entities + comments. Quotes are
# only produced inside the well-formed sampled tags: an UNPAIRED quote inside
# a tag (e.g. "<b'>") is parsed by stdlib's attrfind_tolerant as a junk
# attribute but treated as text by the fast scanner — implementation-defined
# here (the oracle and the engine share one implementation either way).
_SOUP = st.lists(
    st.one_of(
        st.text(alphabet="ab <>&;#/!-=\n", max_size=12),
        st.sampled_from(
            [
                "<p>", "</p>", "<div class='x'>", "</div>", "<a href=x>", "</a>",
                "<br/>", "<nav>", "</nav>", "<script>", "</script>", "<li>",
                "</li>", "<!-- c -->", "<!DOCTYPE html>", "&amp;", "&lt;",
                "&#65;", "&bogus;", "<P >", "</ p>", "<td>", "</td>",
            ]
        ),
    ),
    max_size=25,
)


def _blocks(parser_cls, html: str):
    p = parser_cls()
    try:
        p.feed(html)
        p.close()
    except Exception:
        txt = _WS.sub(" ", re.sub(r"<[^>]+>", " ", html)).strip()
        return [("FALLBACK", txt, len(txt) >= MIN_BLOCK_CHARS)]
    return [(b.text(), b.link_chars, b.order) for b in p.blocks if b.text()]


@settings(max_examples=120, deadline=None)
@given(_SOUP)
def test_fast_html_parser_matches_stdlib_on_tag_soup(parts):
    html = "".join(parts)
    assert _blocks(_FastBlockParser, html) == _blocks(_BlockParser, html)
