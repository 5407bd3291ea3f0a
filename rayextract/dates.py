"""F4 — deterministic first-match date recognizer.

The reference calls Microsoft.Recognizers.Text and returns the *surface text*
of the first date-ish mention, else ""
(/root/reference/NameRecognizer/EntityRecognizer.cs:12-27). Rebuilt as a pure
regex grammar over numeric and month-name forms with the same first-match,
surface-text-out semantics. The grammar is fixed and documented so the DuckDB
oracle can mirror it with ``regexp_extract`` (RE2: no lookaround used here).
"""

from __future__ import annotations

import re

_MONTH = (
    "JAN(?:UARY)?|FEB(?:RUARY)?|MAR(?:CH)?|APR(?:IL)?|MAY|JUN(?:E)?|"
    "JUL(?:Y)?|AUG(?:UST)?|SEP(?:T(?:EMBER)?)?|OCT(?:OBER)?|NOV(?:EMBER)?|DEC(?:EMBER)?"
)

# Alternation ordered longest-form-first; overall winner is the EARLIEST start
# offset (single combined regex search), matching "FirstOrDefault" semantics.
DATE_PATTERN = (
    r"\b(?:"
    r"\d{4}-\d{1,2}-\d{1,2}"                                   # ISO 2020-09-23
    r"|\d{1,2}[/\-.]\d{1,2}[/\-.]\d{2,4}"                       # 09/23/2020, 1-2-99
    r"|(?:" + _MONTH + r")\.? \d{1,2}(?:ST|ND|RD|TH)?,? \d{4}"  # March 5, 1999
    r"|\d{1,2} (?:" + _MONTH + r")\.?,? \d{4}"                  # 5 March 1999
    r")\b"
)

_DATE_RE = re.compile(DATE_PATTERN, re.IGNORECASE)


def recognize_date(text: str) -> str:
    """Surface text of the first date mention, else "" (EntityRecognizer.cs:20-26)."""
    m = _DATE_RE.search(text)
    return m.group(0) if m else ""


def recognize_date_span(text: str) -> tuple[str, int, int] | None:
    """(surface, start, end) of the first date mention, else None."""
    m = _DATE_RE.search(text)
    if m is None:
        return None
    return m.group(0), m.start(), m.end()


def duckdb_pattern() -> str:
    """The same grammar as an RE2/DuckDB pattern (case-insensitive flag is
    passed separately to regexp_extract)."""
    return DATE_PATTERN.replace("?:", "?:")
