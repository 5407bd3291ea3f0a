"""D2 analog — HTML boilerplate stripper (main-content extraction).

The reference's D2 stage turns a raw page into ordered text lines via Tesseract
(/root/reference/TextExtraction/Worker.cs:144-200). For transcript payloads the
equivalent "decode" is Readability/trafilatura-style block scoring over a
lightweight DOM: segment into block-level elements, score each block by text
density vs link density, drop chrome (nav/header/footer/aside/script/style)
and link-farm blocks, keep content blocks in document order.

Pure stdlib (html.parser); deterministic; no network, no external models.
The parser tables are built once per actor (D4 pattern) when this runs inside
the ContentParser actor stage (see pipeline.py).
"""

from __future__ import annotations

import re
from html import unescape as _unescape
from html.parser import HTMLParser

try:
    # CPython-private names — present in every 3.x to date but undocumented,
    # so a rename must not take this module down with an ImportError.
    from html.parser import attrfind_tolerant as _stdlib_attrfind_tolerant
    from html.parser import (
        locatestarttagend_tolerant as _stdlib_locatestarttagend_tolerant,
    )
    from html.parser import tagfind_tolerant as _stdlib_tagfind_tolerant
except ImportError:  # pragma: no cover - vendored copies of the 3.12 regexes
    _stdlib_tagfind_tolerant = re.compile(
        r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*"
    )
    _stdlib_attrfind_tolerant = re.compile(
        r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
        r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*'
    )
    _stdlib_locatestarttagend_tolerant = re.compile(
        r"""
      <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
      (?:[\s/]*                          # optional whitespace before attribute name
        (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
          (?:\s*=+\s*                    # value indicator
            (?:'[^']*'                   # LITA-enclosed value
              |"[^"]*"                   # LIT-enclosed value
              |(?!['"])[^>\s]*           # bare value
            )
            (?:\s*,)*                    # possibly followed by a comma
          )?(?:\s|/(?!>))*
        )*
      )?
      \s*                                # trailing whitespace
    """,
        re.VERBOSE,
    )

BLOCK_TAGS = frozenset(
    {"p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
     "article", "section", "blockquote", "pre", "main", "tr", "table", "ul", "ol", "body"}
)
CHROME_TAGS = frozenset({"nav", "header", "footer", "aside", "script", "style", "noscript", "form"})

MIN_BLOCK_CHARS = 25      # blocks shorter than this are boilerplate fragments
MAX_LINK_DENSITY = 0.33   # fraction of block text inside <a> links

_WS = re.compile(r"\s+")
# any whitespace that r"\s+" -> " " would actually CHANGE: a run of two
# spaces, or any \s char that isn't a plain space (incl. unicode spaces)
_WS_ODD = re.compile(r"[^\S ]|  ")


class _Block:
    __slots__ = ("parts", "link_chars", "order")

    def __init__(self, order: int):
        self.parts: list[str] = []
        self.link_chars = 0
        self.order = order

    def text(self) -> str:
        j = "".join(self.parts)
        if _WS_ODD.search(j) is None:  # sub would be a no-op: skip the copy
            return j.strip()
        return _WS.sub(" ", j).strip()


class _BlockParser(HTMLParser):
    """Single pass: accumulate text into blocks; track chrome + link depth."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._chrome_depth = 0
        self._link_depth = 0
        self._n = 0

    def _flush(self):
        if self._cur is not None and self._cur.parts:
            self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag in CHROME_TAGS:
            self._chrome_depth += 1
            self._flush()
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            self._cur = _Block(self._n)
            self._n += 1
        if tag == "br" and self._cur is not None:
            self._cur.parts.append(" ")

    def handle_endtag(self, tag):
        if tag in CHROME_TAGS:
            self._chrome_depth = max(0, self._chrome_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._chrome_depth > 0 or not data:
            return
        if self._cur is None:
            self._cur = _Block(self._n)
            self._n += 1
        self._cur.parts.append(data)
        if self._link_depth > 0:
            self._cur.link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


class _FastBlockParser:
    """Regex tag scanner driving the same block state machine as
    ``_BlockParser`` — byte-identical output (parity-tested in
    tests/test_html_parity.py), ~8x faster than stdlib html.parser, which
    dominated the ContentParser stage profile (char-wise goahead loop)."""

    # Start tags are parsed with stdlib html.parser's OWN tolerant regexes
    # (tagfind_tolerant / attrfind_tolerant / locatestarttagend_tolerant) so
    # extent, name, and junk-tag handling are structurally identical to
    # _BlockParser. The previous hand-rolled single regex
    # r"<(name)((?:[^>\"']|\"...\"|'...')*)>" had (a) quadratic backtracking
    # across the ambiguous name/attrs split on failure (a 100 KB unterminated
    # tag hung the scanner) and (b) divergent tokenization from stdlib on
    # quote-in-name tags like <a"b c">. Stdlib's regexes are verified linear
    # on the adversarial shapes (see test_gate_linear_on_pathological).
    _TAGFIND = _stdlib_tagfind_tolerant
    _ATTRFIND = _stdlib_attrfind_tolerant
    _LOCATE_START = _stdlib_locatestarttagend_tolerant
    _END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
    _NAME_TOLERANT = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)")
    _CLOSE = {
        t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in ("script", "style")
    }

    def __init__(self):
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._chrome_depth = 0
        self._link_depth = 0
        self._n = 0

    _flush = _BlockParser._flush
    handle_starttag = _BlockParser.handle_starttag
    handle_endtag = _BlockParser.handle_endtag
    handle_data = _BlockParser.handle_data

    def _check_whole_start(self, html: str, i: int) -> int:
        """stdlib check_for_whole_start_tag, one-shot (feed+close) semantics:
        -1 means the tag is incomplete at end of input (stdlib would wait for
        more data; with end=1 the caller emits via the k<0 data branch)."""
        m = self._LOCATE_START.match(html, i)
        j = m.end()
        nxt = html[j:j + 1]
        if nxt == ">":
            return j + 1
        if nxt == "/":
            if html.startswith("/>", j):
                return j + 2
            return -1  # stdlib: buffer boundary -> incomplete
        if nxt == "":
            return -1  # end of input
        if "a" <= nxt <= "z" or "A" <= nxt <= "Z" or nxt == "=" or nxt == "/":
            # end of input in or before attribute value (stdlib comment)
            return -1
        return j if j > i else i + 1

    def _unterminated(self, html: str, lt: int) -> int:
        """stdlib fallback for a construct with no closing '>': emit data up
        to (and incl.) the next '>', else to the next '<', else one char
        (html.parser goahead's k<0 branch)."""
        from html import unescape

        gt = html.find(">", lt + 1)
        if gt >= 0:
            k = gt + 1
        else:
            nlt = html.find("<", lt + 1)
            k = nlt if nlt >= 0 else lt + 1
        data = html[lt:k]
        if "&" in data:
            data = unescape(data)
        self.handle_data(data)
        return k

    def feed(self, html: str) -> None:
        # The tag/data state machine is INLINED here rather than dispatched
        # through handle_starttag/handle_endtag/handle_data: those ~3 method
        # calls per tag were ~30% of the HTML-decode wall, which itself
        # dominates the ContentParser stage profile. Semantics are pinned
        # byte-identical to _BlockParser by tests/test_html_parity.py — any
        # edit here must keep that suite green.
        pos, n = 0, len(html)
        find = html.find
        check_start = self._check_whole_start
        tagfind = self._TAGFIND.match
        attrfind = self._ATTRFIND.match
        end_match = self._END.match
        blocks = self.blocks
        cur = self._cur
        chrome = self._chrome_depth
        link = self._link_depth
        nblk = self._n
        while pos < n:
            lt = find("<", pos)
            if lt < 0:
                lt = n
            if lt > pos:
                data = html[pos:lt]
                if "&" in data:
                    data = _unescape(data)
                # inline handle_data
                if chrome == 0:
                    if cur is None:
                        cur = _Block(nblk)
                        nblk += 1
                    cur.parts.append(data)
                    if link > 0:
                        cur.link_chars += len(data.strip())
            if lt >= n:
                break
            nxt = html[lt + 1] if lt + 1 < n else ""
            if "a" <= nxt <= "z" or "A" <= nxt <= "Z":
                endpos = check_start(html, lt)
                if endpos < 0:
                    # incomplete start tag at EOF: stdlib goahead(end=1)
                    # k<0 branch — emit data to next '>'/'<'/one char
                    self._sync(cur, chrome, link, nblk)
                    pos = self._unterminated(html, lt)
                    cur, chrome, link, nblk = (
                        self._cur, self._chrome_depth, self._link_depth, self._n
                    )
                    continue
                tm = tagfind(html, lt + 1)
                tag = tm.group(1).lower()
                j = tm.end()
                while j < endpos:
                    am = attrfind(html, j)
                    if not am:
                        break
                    j = am.end()
                tag_end = html[j:endpos].strip()
                if tag_end != ">" and tag_end != "/>":
                    # junk start tag: stdlib parse_starttag emits the whole
                    # span as data, RAW (its bad-end branch skips unescape)
                    if chrome == 0:
                        if cur is None:
                            cur = _Block(nblk)
                            nblk += 1
                        data = html[lt:endpos]
                        cur.parts.append(data)
                        if link > 0:
                            cur.link_chars += len(data.strip())
                    pos = endpos
                    continue
                selfclosing = tag_end == "/>"
                # inline handle_starttag
                if tag in CHROME_TAGS:
                    chrome += 1
                    if cur is not None and cur.parts:
                        blocks.append(cur)
                    cur = None
                    if selfclosing:
                        chrome = chrome - 1 if chrome > 0 else 0
                    pos = endpos
                    # script/style (both chrome) are CDATA: their body is
                    # suppressed (chrome > 0) but pos must jump past the
                    # FULL close tag — or to end-of-input when unclosed,
                    # leaving chrome incremented exactly as _BlockParser
                    # does (close tag never fires).
                    if not selfclosing and tag in ("script", "style"):
                        cm = self._CLOSE[tag].search(html, pos)
                        if cm:
                            chrome = chrome - 1 if chrome > 0 else 0
                            pos = cm.end()
                        else:
                            pos = n
                    continue
                if tag == "a":
                    link += 1
                if tag in BLOCK_TAGS:
                    if cur is not None and cur.parts:
                        blocks.append(cur)
                    cur = _Block(nblk)
                    nblk += 1
                elif tag == "br" and cur is not None:
                    cur.parts.append(" ")
                if selfclosing:
                    # inline handle_endtag
                    if tag == "a":
                        link = link - 1 if link > 0 else 0
                    if tag in BLOCK_TAGS:
                        if cur is not None and cur.parts:
                            blocks.append(cur)
                        cur = None
                pos = endpos
                # (script/style CDATA is handled in the chrome branch
                # above — both tags are CHROME_TAGS. stdlib's
                # set_cdata_mode pattern is r'</\s*tag\s*>'
                # (html/parser.py:122-124) — a prefix like '</scriptx>'
                # or '</script foo>' does NOT end CDATA and stays data;
                # with no close tag at all, goahead breaks and the
                # remaining payload is never emitted, verified vs 3.11.)
            elif nxt == "/":
                gt = find(">", lt + 1)
                if gt < 0:
                    self._sync(cur, chrome, link, nblk)
                    pos = self._unterminated(html, lt)
                    cur, chrome, link, nblk = (
                        self._cur, self._chrome_depth, self._link_depth, self._n
                    )
                    continue
                m = end_match(html, lt)
                if m:
                    tag = m.group(1).lower()
                    pos = m.end()
                else:
                    nm = self._NAME_TOLERANT.match(html, lt + 2)
                    if nm:
                        # discarded-junk end tag (</a b>): fire name, skip junk
                        tag = nm.group(1).lower()
                        pos = find(">", nm.end()) + 1
                    elif html.startswith("</>", lt):
                        pos = lt + 3
                        continue
                    else:
                        # bogus end tag (</1x>): consumed silently to '>'
                        pos = gt + 1
                        continue
                # inline handle_endtag
                if tag in CHROME_TAGS:
                    chrome = chrome - 1 if chrome > 0 else 0
                    continue
                if tag == "a":
                    link = link - 1 if link > 0 else 0
                if tag in BLOCK_TAGS:
                    if cur is not None and cur.parts:
                        blocks.append(cur)
                    cur = None
            elif nxt == "!":
                if html.startswith("<!--", lt):
                    end = find("-->", lt + 4)
                    if end >= 0:
                        pos = end + 3
                    else:
                        self._sync(cur, chrome, link, nblk)
                        pos = self._unterminated(html, lt)
                        cur, nblk = self._cur, self._n
                else:
                    end = find(">", lt)
                    if end >= 0:
                        pos = end + 1
                    else:
                        self._sync(cur, chrome, link, nblk)
                        pos = self._unterminated(html, lt)
                        cur, nblk = self._cur, self._n
            elif nxt == "?":
                end = find(">", lt)
                if end >= 0:
                    pos = end + 1
                else:
                    self._sync(cur, chrome, link, nblk)
                    pos = self._unterminated(html, lt)
                    cur, nblk = self._cur, self._n
            else:
                if chrome == 0:
                    if cur is None:
                        cur = _Block(nblk)
                        nblk += 1
                    cur.parts.append("<")
                    if link > 0:
                        cur.link_chars += 1
                pos = lt + 1
        self._sync(cur, chrome, link, nblk)

    def _sync(self, cur, chrome, link, nblk) -> None:
        self._cur = cur
        self._chrome_depth = chrome
        self._link_depth = link
        self._n = nblk

    def close(self) -> None:
        self._flush()


# --- bulk-split fast path for "simple" documents ---------------------------
# Eligibility (ONE C-speed fullmatch): every '<' opens a well-formed start
# tag (attrs may carry quotes, but no '<'/'>' inside them — where stdlib's
# tolerant attr regex could disagree on tag extent) or a plain '</name>'
# end tag. No comments, PIs, declarations, unterminated constructs, or
# script/style (CDATA semantics) — those take the general scanner. For
# eligible docs ONE re.split tokenizes the whole document in C and the
# state machine walks the parts without any per-tag regex calls.
_SIMPLE_ATTRS = r"(?:[^<>\"']|\"[^\"<>]*\"|'[^'<>]*')*"
# The eligibility gate is fully POSSESSIVE (*+ / ++, Python 3.11): the old
# backtracking form (?:[^<]+|<tag>|...)* was exponential on ineligible docs
# (one '<!--' after a text run hung the parser pool). Tag extent is
# deterministic (no alternative can consume '>'), so possessiveness only
# drops docs whose tags need name/attr re-splitting (e.g. <a"b c">) — those
# fall back to the exact general scanner, preserving semantics. A gate
# match is therefore always the leftmost-greedy parse, which is exactly
# the tokenization _SIMPLE_SPLIT produces.
_SIMPLE_ATTRS_POSS = r"(?:[^<>\"']++|\"[^\"<>]*+\"|'[^'<>]*+')*+"
_SIMPLE_DOC = re.compile(
    rf"(?:[^<]++|<[a-zA-Z][^\t\n\r\f />\x00]*+{_SIMPLE_ATTRS_POSS}>"
    rf"|</[a-zA-Z][-.a-zA-Z0-9:_]*+>)*+\Z"
)
_SIMPLE_SPLIT = re.compile(
    rf"<(/?)([a-zA-Z][^\t\n\r\f />\x00]*)({_SIMPLE_ATTRS})>"
)
def _simple_blocks(html: str) -> "list[_Block] | None":
    """Block list via the bulk tokenizer, or None if the doc is ineligible
    (caller falls back to the exact general scanner). Output is
    byte-identical to _BlockParser on eligible docs (parity-tested
    exhaustively on the corpus + fuzz suite)."""
    if _SIMPLE_DOC.fullmatch(html) is None:
        return None
    parts = _SIMPLE_SPLIT.split(html)
    # script/style need CDATA semantics -> general scanner (names sit at
    # parts[2::4] after the split; any casing)
    for nm in parts[2::4]:
        if nm in ("script", "style") or nm.lower() in ("script", "style"):
            return None
    blocks: list[_Block] = []
    cur: _Block | None = None
    chrome = 0
    link = 0
    nblk = 0
    # parts = [data0, slash1, name1, attrs1, data1, slash2, name2, ...]
    i, n = 0, len(parts)
    while True:
        data = parts[i]
        if data and chrome == 0:
            if "&" in data:
                data = _unescape(data)
            if cur is None:
                cur = _Block(nblk)
                nblk += 1
            cur.parts.append(data)
            if link > 0:
                cur.link_chars += len(data.strip())
        i += 1
        if i >= n:
            break
        closing, tag, attrs = parts[i], parts[i + 1], parts[i + 2]
        i += 3
        tag = tag.lower()
        if closing:
            # inline handle_endtag
            if tag in CHROME_TAGS:
                chrome = chrome - 1 if chrome > 0 else 0
                continue
            if tag == "a":
                link = link - 1 if link > 0 else 0
            if tag in BLOCK_TAGS:
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = None
            continue
        selfclosing = attrs.endswith("/")
        # inline handle_starttag (script/style excluded by eligibility)
        if tag in CHROME_TAGS:
            chrome += 1
            if cur is not None and cur.parts:
                blocks.append(cur)
            cur = None
            if selfclosing:
                chrome = chrome - 1 if chrome > 0 else 0
            continue
        if tag == "a":
            link += 1
        if tag in BLOCK_TAGS:
            if cur is not None and cur.parts:
                blocks.append(cur)
            cur = _Block(nblk)
            nblk += 1
        elif tag == "br" and cur is not None:
            cur.parts.append(" ")
        if selfclosing:
            if tag == "a":
                link = link - 1 if link > 0 else 0
            if tag in BLOCK_TAGS:
                if cur is not None and cur.parts:
                    blocks.append(cur)
                cur = None
    if cur is not None and cur.parts:
        blocks.append(cur)
    return blocks


def extract_blocks(html: str) -> list[tuple[str, float, bool]]:
    """[(block_text, link_density, kept)] in document order."""
    simple = _simple_blocks(html)
    if simple is not None:
        out = []
        for b in simple:
            t = b.text()
            if not t:
                continue
            ld = b.link_chars / max(1, len(t))
            kept = len(t) >= MIN_BLOCK_CHARS and ld <= MAX_LINK_DENSITY
            out.append((t, ld, kept))
        return out
    p = _FastBlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed markup: fall back to tag-stripped text as one block
        txt = _WS.sub(" ", re.sub(r"<[^>]+>", " ", html)).strip()
        return [(txt, 0.0, len(txt) >= MIN_BLOCK_CHARS)]
    out = []
    for b in p.blocks:
        t = b.text()
        if not t:
            continue
        ld = b.link_chars / max(1, len(t))
        kept = len(t) >= MIN_BLOCK_CHARS and ld <= MAX_LINK_DENSITY
        out.append((t, ld, kept))
    return out


def extract_main_content(html: str) -> str:
    """Kept content blocks joined by newlines, in document order."""
    return "\n".join(t for t, _, kept in extract_blocks(html) if kept)


def looks_like_html(text: str) -> bool:
    s = text.lstrip()
    return s.startswith("<") and "</" in text


# --- deterministic page synthesis for the driver's value-hash oracle -------
# The flagship pipeline's HTML path (D2) is exercised over sf_dir documents by
# wrapping each document in a full boilerplate page whose every byte is
# integer arithmetic on (doc_id, text) — the same synthesize-then-decode
# contract the WAV/BMP/OCR codecs use (multimodal.py, ocr.py) — so the DuckDB
# oracle can regenerate the EXPECTED extraction outcome and value-hash the
# stripper end to end, not just row-count it.

from html import escape as _escape  # noqa: E402


def synth_page(doc_id: int, text: str) -> str:
    """One boilerplate-wrapped page: nav + header chrome, the document's
    tokens re-paragraphed in 20-token <p> blocks, one mixed content+link
    paragraph (link density ~0.25, must be KEPT), one link-farm div (link
    density ~1, must be DROPPED), footer chrome. Entity-escaped so the
    block texts round-trip exactly through the parser's unescape."""
    toks = text.split()
    paras = [" ".join(toks[i : i + 20]) for i in range(0, len(toks), 20)]
    body = "".join(f"<p>{_escape(p, quote=False)}</p>" for p in paras)
    return (
        "<html><body>"
        '<nav><a href="/n0">nav item zero</a> <a href="/n1">nav item one</a></nav>'
        "<header><h1>site header chrome</h1></header>"
        f'<div class="content">{body}'
        f"<p>related reading for document {doc_id:08d} item {doc_id % 100}: "
        f'see <a href="/more">more here details</a></p></div>'
        '<div><a href="/p0">promo block entry zero</a> '
        '<a href="/p1">promo block entry one</a></div>'
        "<footer>copyright 2020 boilerplate footer text</footer>"
        "</body></html>"
    )


def main_content_batch(t):
    """pyarrow batch fn: (doc_id, text) -> (doc_id, main_text, n_blocks,
    n_kept). Stateless (module-level compiled regexes), so it runs as plain
    map_batches tasks — no actor pool needed."""
    import pyarrow as pa

    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    main, nblk, nkept = [], [], []
    for doc_id, text in zip(ids, texts):
        blocks = extract_blocks(synth_page(doc_id, text if isinstance(text, str) else ""))
        main.append("\n".join(b for b, _, kept in blocks if kept))
        nblk.append(len(blocks))
        nkept.append(sum(1 for _, _, kept in blocks if kept))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "main_text": pa.array(main, pa.string()),
            "n_blocks": pa.array(nblk, pa.int64()),
            "n_kept": pa.array(nkept, pa.int64()),
        }
    )
