"""Poison-row quarantine: a throwing payload is recorded, never dropped.

Reference semantics: a failing page is logged and an empty PageData still
appended, so the document completes (Worker.cs:117-125). Here: empty
extracted text + parse_error string; the conversation's other turns still
extract; the oracle shares the same safe_decode so semantics cannot drift.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

import rayextract.decode as decode_mod
from rayextract.config import ExtractConfig
from rayextract.oracle import oracle_turn
from rayextract.stages import ContentParser

MARKER = "<b>BOOM-PAYLOAD</b>"


@pytest.fixture()
def poisoned(monkeypatch):
    real = decode_mod.extract_main_content

    def boom(html: str) -> str:
        if "BOOM-PAYLOAD" in html:
            raise ValueError("synthetic decode failure")
        return real(html)

    monkeypatch.setattr(decode_mod, "extract_main_content", boom)


def test_stage_quarantines_and_continues(poisoned):
    batch = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c1"], pa.string()),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "text": pa.array(
                [MARKER, "plain INVOICE # 42 line", "<p>a healthy html paragraph with enough text</p>"],
                pa.string(),
            ),
        }
    )
    out = ContentParser(ExtractConfig())(batch)
    errs = out.column("parse_error").to_pylist()
    assert errs[0] is not None and "ValueError" in errs[0]
    assert errs[1] is None and errs[2] is None
    # quarantined row: empty text, no candidates, zero confidence
    assert out.column("extracted_text")[0].as_py() == ""
    assert out.column("candidates")[0].as_py() == []
    assert out.column("confidence")[0].as_py() == 0.0
    # the rest of the conversation still extracts
    c1 = out.column("candidates")[1].as_py()
    assert any(c["field"] == "invoice_number" for c in c1)
    assert "healthy html paragraph" in out.column("extracted_text")[2].as_py()


def test_oracle_matches_quarantine_semantics(poisoned):
    t = oracle_turn(MARKER)
    assert t["parse_error"] is not None and "ValueError" in t["parse_error"]
    assert t["extracted_text"] == "" and t["confidence"] == 0.0
    ok = oracle_turn("<p>a healthy html paragraph with enough text</p>")
    assert ok["parse_error"] is None and ok["extracted_text"]


def test_stage_and_oracle_agree_on_poison(poisoned):
    batch = pa.table(
        {
            "conv_id": pa.array(["c"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "text": pa.array([MARKER], pa.string()),
        }
    )
    got = ContentParser(ExtractConfig())(batch)
    want = oracle_turn(MARKER)
    for col in ("kind", "extracted_text", "clean_text", "parse_error"):
        assert got.column(col)[0].as_py() == want[col], col


def test_null_text_rows_do_not_crash():
    """TRANSCRIPT_SCHEMA allows null text: a null row must route as plain
    with empty derived columns and zero confidence, never a TypeError."""
    batch = pa.table(
        {
            "conv_id": pa.array(["c1", "c1"], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "text": pa.array([None, "INVOICE # 7 here"], pa.string()),
        }
    )
    out = ContentParser(ExtractConfig())(batch)
    assert out.column("kind")[0].as_py() == "plain"
    assert out.column("extracted_text")[0].as_py() is None
    assert out.column("confidence")[0].as_py() == 0.0
    assert out.column("candidates")[0].as_py() == []
    # the non-null row still extracts
    assert any(
        c["field"] == "invoice_number" for c in out.column("candidates")[1].as_py()
    )
