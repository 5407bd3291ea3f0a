"""Shared payload decode with poison-row quarantine.

The reference wraps each page's OCR in try/catch: a failing page is logged
and an EMPTY PageData still appended, so the document completes and the error
is recorded, not silently dropped (/root/reference/TextExtraction/Worker.cs:
117-125). The analog here: a turn whose decode raises yields empty extracted
text plus a ``parse_error`` string column; the conversation's fold proceeds
over the remaining turns and the per-shard manifest counts the quarantined
rows (pipeline._shard_metrics).

Both the distributed stage (stages.ContentParser) and the golden oracle
(oracle.oracle_turn) decode through this one function, so quarantine
semantics can never drift between them.
"""

from __future__ import annotations

from .html_extract import extract_main_content
from .pdf_layout import extract_reading_order


def safe_decode(text: str, kind: str) -> tuple[str, str | None]:
    """(extracted_text, parse_error) for a non-plain payload.

    ``kind``: "pdfish" | "html". On ANY decode exception: ("", "Type: msg").
    """
    try:
        if kind == "pdfish":
            return extract_reading_order(text), None
        return extract_main_content(text), None
    except Exception as e:  # noqa: BLE001 - quarantine semantics
        return "", f"{type(e).__name__}: {e}"[:200]
