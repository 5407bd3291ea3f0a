"""E1-E7 — field extractors as a candidate-emitting registry (SURVEY.md §2.4).

Each extractor in the reference fires per line, first-match-wins per document
(/root/reference/TextExtraction/Worker.cs:201-458). Here each is a spec
``(field, fire(clean_upper) -> (value, start, end) | None)`` applied per turn;
the per-conversation winner is picked by the E9 fold (fold.py), defined ONLY
by (turn_idx, extractor order) — never arrival order.

Regexes are ported rule-for-rule from the cited model classes; the quirky
value rules (first digit-run in the whole line for invoice number, label-strip
for gross amount) are preserved verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from .config import ExtractConfig
from .dates import recognize_date_span
from .ner import first_person_span
from .textnorm import contains_any

# --- ported trigger regexes (all run on the F1+F2 normalized upper text) ----
# Model/InvoiceNumber.cs:15
INVOICE_NUM_RE = re.compile(r"\b(INVOICE)(\W+|\s+)(\d+)\b")
# Model/InvoiceNumber.cs:17 — value = first [.\d]+ run anywhere in the line
DIGIT_RUN_RE = re.compile(r"[.\d]+")
# Model/InvoiceDate.cs:18 — any DATE line that isn't a DUE ... DATE line
INVOICE_DATE_RE = re.compile(r"^(?!.*DUE.*DATE)(?=.*(?:INVOICE\s+)?DATE).*$", re.DOTALL)
# Model/PurchaseOrder.cs:15 — group 2 is the order token
PURCHASE_ORDER_RE = re.compile(r"\b(LOAD|REFERENCE)\W+(\w+\d+\w+)")
# Model/GrossAmount.cs:17
GROSS_RE = re.compile(r"\b(TOTAL|RATE|BALANCE DUE)\W+\$\d+(,\d{3})*(\.\d{2})?")
# Model/GrossAmount.cs:19-23 — strip the label words then trim
GROSS_LABEL_RE = re.compile(r"TOTAL|RATE|BALANCE|DUE")
# Model/PatientBirthDate.cs:19-21
BIRTHDATE_KEYS = ("DATE OF BIRTH", "DOB", "BIRTH DATE")

Fire = Callable[[str], "tuple[str, int, int] | None"]


@dataclass(frozen=True)
class ExtractorSpec:
    field: str
    fire: Fire


def fire_patient_birthdate(t: str) -> tuple[str, int, int] | None:
    """E1 (Model/PatientBirthDate.cs:16-64): birth keyword gate -> F4 date."""
    if not contains_any(t, BIRTHDATE_KEYS):
        return None
    return recognize_date_span(t)


def fire_patient_name(t: str) -> tuple[str, int, int] | None:
    """E2 (Model/PatientName.cs:14-27): person NER on the normalized line.

    The keyword gate (F3, patient keys) happens upstream in the pipeline,
    exactly as Worker.cs:216-231 gates lines before calling the extractor.
    """
    return first_person_span(t)


def fire_invoice_number(t: str) -> tuple[str, int, int] | None:
    """E3: INVOICE <sep> digits; value = first [.\\d]+ run in the line."""
    if INVOICE_NUM_RE.search(t) is None:
        return None
    m = DIGIT_RUN_RE.search(t)
    if m is None:
        return None
    return m.group(0), m.start(), m.end()


def fire_invoice_date(t: str) -> tuple[str, int, int] | None:
    """E4: negative-lookahead DATE gate (verbatim) -> F4 date."""
    if INVOICE_DATE_RE.match(t) is None:
        return None
    return recognize_date_span(t)


def fire_purchase_order(t: str) -> tuple[str, int, int] | None:
    """E5: LOAD/REFERENCE token -> group 2."""
    m = PURCHASE_ORDER_RE.search(t)
    if m is None:
        return None
    return m.group(2), m.start(2), m.end(2)


def fire_gross_amount(t: str) -> tuple[str, int, int] | None:
    """E6: TOTAL/RATE/BALANCE DUE $amount; value = match minus label words."""
    m = GROSS_RE.search(t)
    if m is None:
        return None
    value = GROSS_LABEL_RE.sub("", m.group(0)).strip()
    return value, m.start(), m.end()


def patient_specs() -> list[ExtractorSpec]:
    # order matches Worker.cs:222-231 (name then birthdate is irrelevant —
    # fields are distinct — but keep the reference's order for determinism)
    return [
        ExtractorSpec("patient_name", fire_patient_name),
        ExtractorSpec("patient_birthdate", fire_patient_birthdate),
    ]


def invoice_specs() -> list[ExtractorSpec]:
    # order matches Worker.cs:375-394
    return [
        ExtractorSpec("invoice_number", fire_invoice_number),
        ExtractorSpec("invoice_date", fire_invoice_date),
        ExtractorSpec("order_number", fire_purchase_order),
        ExtractorSpec("gross_total", fire_gross_amount),
    ]


def vendor_candidate(
    conv_id: str, clean_upper: str, lookup: dict[tuple[str, str], str] | None
) -> tuple[str, int, int] | None:
    """E7 generalization of the hard-coded vendor table (Worker.cs:299-364):
    broadcast small-side exact-equality lookup keyed by (conv_id, line)."""
    if not lookup:
        return None
    v = lookup.get((conv_id, clean_upper))
    if v is None:
        return None
    return v, 0, len(clean_upper)


_PATIENT_SPECS = None
_INVOICE_SPECS = None


def candidates_for_turn(
    conv_id: str,
    clean_upper: str,
    cfg: ExtractConfig,
    patient_keys: tuple[str, ...] | None = None,
    invoice_keys: tuple[str, ...] | None = None,
) -> list[tuple[str, str, int, int]]:
    """All (field, value, start, end) candidates one turn emits.

    Mirrors the reference's per-line extractor pass: patient extractors run
    behind the patient-key gate (Worker.cs:216-220), invoice extractors behind
    the invoice-key gate (Worker.cs:294-296). Emission is unconditional per
    turn — suppression of later matches is the fold's job (E9), which keeps
    this stage embarrassingly parallel.

    ``patient_keys``/``invoice_keys``: pre-uppercased key tuples (callers in
    hot loops pass their cached copies; cfg.*_keys_upper() rebuilds tuples).
    """
    global _PATIENT_SPECS, _INVOICE_SPECS
    if _PATIENT_SPECS is None:
        _PATIENT_SPECS = patient_specs()
        _INVOICE_SPECS = invoice_specs()
    if patient_keys is None:
        patient_keys = cfg.patient_keys_upper()
    if invoice_keys is None:
        invoice_keys = cfg.invoice_keys_upper()
    out = []
    if cfg.extract_patient and contains_any(clean_upper, patient_keys):
        for spec in _PATIENT_SPECS:
            r = spec.fire(clean_upper)
            if r is not None:
                out.append((spec.field, r[0], r[1], r[2]))
    if cfg.extract_invoice and contains_any(clean_upper, invoice_keys):
        for spec in _INVOICE_SPECS:
            r = spec.fire(clean_upper)
            if r is not None:
                out.append((spec.field, r[0], r[1], r[2]))
    v = vendor_candidate(conv_id, clean_upper, cfg.vendor_lookup)
    if v is not None:
        out.append(("vendor_name", v[0], v[1], v[2]))
    return out
