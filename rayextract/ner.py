"""F5-F7 — deterministic entity tagger (person / organization spans).

The reference runs a Stanford CRF classifier and returns the first
``<PERSON>``/``<ORGANIZATION>`` group from inline-XML tagged text
(/root/reference/NameRecognizer/EntityRecognizer.cs:29-48,72-91), loaded once
per worker (D4, Worker.cs:61-95). Rebuilt as a deterministic shape+gazetteer
tagger with identical call semantics: first entity's surface text, else None.

Tagger spec (fixed; the oracle shares these scalars, pipeline tests verify the
distributed orchestration around them):

- tokens = maximal ``\\S+`` runs with char offsets; a token's *core* strips
  trailing ``:,.`` punctuation.
- name token: core matches ``[A-Z][A-Z'.\\-]*``, len(core) >= 2, core not in
  the stop gazetteer (keyword-list words + common function words).
- PERSON: first maximal run of 2-4 consecutive name tokens; surface = the
  original substring from first token start to last token end.
- ORG: first maximal run (1-5 tokens, name tokens or ``&``) whose last core is
  an org suffix (LLC, INC, ...); surface likewise.

Input is the F1+F2 normalized upper text, matching the reference call order
(Model/PatientName.cs:14-27: filter -> upper -> NER).
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"\S+")
_NAME_CORE = re.compile(r"[A-Z][A-Z'.\-]*\Z")

ORG_SUFFIXES = frozenset({"LLC", "INC", "CORP", "CO", "LTD", "LLP", "GMBH", "COMPANY"})

# keyword-list words (config.PATIENT_KEYS / INVOICE_KEYS split) + function words
STOP_GAZETTEER = frozenset(
    {
        "NAME", "OF", "THE", "PATIENT", "INSURED", "MEMBER", "DOB", "BIRTH",
        "DATE", "LOAD", "INVOICE", "NUMBER", "PURCHASE", "ORDER", "AMOUNT",
        "REFERENCE", "RATE", "TOTAL", "BALANCE", "DUE",
        "A", "AN", "AND", "OR", "TO", "IN", "ON", "AT", "BY", "FOR", "WITH",
        "FROM", "IS", "ARE", "WAS", "BE", "THIS", "THAT", "IT", "AS", "NOT",
        "MR", "MRS", "MS", "DR", "NO",
        "VENDOR", "PAY", "BILL", "SHIP", "SOLD", "ATTN", "PAGE",
    }
    | ORG_SUFFIXES
)


def _tokens(text: str) -> list[tuple[str, str, int, int]]:
    """[(raw, core, start, end)] for each whitespace-delimited token."""
    out = []
    for m in _TOKEN.finditer(text):
        raw = m.group(0)
        core = raw.rstrip(":,.")
        out.append((raw, core, m.start(), m.end()))
    return out


def _is_name(core: str) -> bool:
    return len(core) >= 2 and core not in STOP_GAZETTEER and _NAME_CORE.match(core) is not None


def first_person_span(text: str) -> tuple[str, int, int] | None:
    """F5: first run of 2-4 name tokens -> (surface, start, end), else None."""
    toks = _tokens(text)
    i, n = 0, len(toks)
    while i < n:
        if _is_name(toks[i][1]):
            j = i
            while j + 1 < n and j + 1 - i < 4 and _is_name(toks[j + 1][1]):
                j += 1
            if j > i:  # at least 2 tokens
                start, end = toks[i][2], toks[j][3]
                return text[start:end], start, end
            i = j + 1
        else:
            i += 1
    return None


def first_org_span(text: str) -> tuple[str, int, int] | None:
    """F6: first run ending in an org suffix -> (surface, start, end), else None."""
    toks = _tokens(text)
    for k, (_, core, _, end) in enumerate(toks):
        if core in ORG_SUFFIXES:
            i = k
            while i - 1 >= 0 and k - (i - 1) < 5 and (
                _is_name(toks[i - 1][1]) or toks[i - 1][1] == "&"
            ):
                i -= 1
            start = toks[i][2]
            return text[start:end], start, end
    return None


def get_person_name(text: str) -> str | None:
    """Reference ``GetPersonName`` shape (EntityRecognizer.cs:29-48)."""
    s = first_person_span(text)
    return s[0] if s else None


def get_organization_name(text: str) -> str | None:
    """Reference ``GetOrganizationName`` shape (EntityRecognizer.cs:72-91)."""
    s = first_org_span(text)
    return s[0] if s else None


def get_annotations(text: str) -> str:
    """F7 debug mode: inline-tagged text (EntityRecognizer.cs:67-70 analog)."""
    spans = []
    p = first_person_span(text)
    if p:
        spans.append(("PERSON", p[1], p[2]))
    o = first_org_span(text)
    if o:
        spans.append(("ORGANIZATION", o[1], o[2]))
    spans.sort(key=lambda s: s[1])
    out, pos = [], 0
    for label, a, b in spans:
        if a < pos:
            continue
        out.append(text[pos:a])
        out.append(f"<{label}>{text[a:b]}</{label}>")
        pos = b
    out.append(text[pos:])
    return "".join(out)
