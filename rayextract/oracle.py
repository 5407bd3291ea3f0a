"""Pure-Python, single-threaded golden oracle (SURVEY.md §5).

Implements the *reference's* control flow directly — per document (conv), loop
lines (turns) in order, run each extractor only while its field is still empty
(the ``string.IsNullOrEmpty`` guards at
/root/reference/TextExtraction/Worker.cs:222-236,375-394) — using the same
scalar rule functions as the engine. The distributed pipeline must reproduce
this exactly under any partitioning / block permutation; the pytest golden +
property tests assert byte-equality of per-turn text and per-conv fields.
"""

from __future__ import annotations

from collections import defaultdict

from .config import ExtractConfig
from .extractors import (
    fire_gross_amount,
    fire_invoice_date,
    fire_invoice_number,
    fire_patient_birthdate,
    fire_patient_name,
    fire_purchase_order,
    vendor_candidate,
)
from .decode import safe_decode
from .html_extract import looks_like_html
from .pdf_layout import looks_like_pdfish
from .schema import FIELD_NAMES
from .textnorm import contains_any, remove_special_characters, upper_invariant

_PATIENT_ORDER = [("patient_name", fire_patient_name), ("patient_birthdate", fire_patient_birthdate)]
_INVOICE_ORDER = [
    ("invoice_number", fire_invoice_number),
    ("invoice_date", fire_invoice_date),
    ("order_number", fire_purchase_order),
    ("gross_total", fire_gross_amount),
]


def oracle_turn(text: str) -> dict:
    """Per-turn decode + normalize (D1/D2/F1/F2 reference semantics)."""
    err = None
    if looks_like_pdfish(text):
        kind = "pdfish"
        extracted, err = safe_decode(text, kind)
    elif looks_like_html(text):
        kind = "html"
        extracted, err = safe_decode(text, kind)
    else:
        kind, extracted = "plain", text
    clean = remove_special_characters(extracted)
    upper = upper_invariant(clean)
    conf = 100.0 * len(clean) / max(len(extracted), 1) if len(extracted) > 0 else 0.0
    return {"kind": kind, "extracted_text": extracted, "clean_text": clean,
            "clean_upper": upper, "confidence": conf, "parse_error": err}


def oracle_conversation(rows: list[dict], cfg: ExtractConfig | None = None) -> dict:
    """Reference-style sequential fold over one conversation's rows.

    ``rows`` need not be sorted; the oracle sorts by turn_idx — the invariant
    ordering (never arrival order).
    """
    cfg = cfg or ExtractConfig()
    rows = sorted(rows, key=lambda r: r["turn_idx"])
    fields: dict[str, tuple[str, int] | None] = {f: None for f in FIELD_NAMES}
    conf_sum, n = 0.0, 0
    pkeys, ikeys = cfg.patient_keys_upper(), cfg.invoice_keys_upper()
    for row in rows:
        t = oracle_turn(row["text"])
        conf_sum += t["confidence"]
        n += 1
        u = t["clean_upper"]
        if not u:
            continue
        if cfg.extract_patient and contains_any(u, pkeys):
            for fname, fire in _PATIENT_ORDER:
                if fields[fname] is None:           # IsNullOrEmpty guard
                    r = fire(u)
                    if r is not None:
                        fields[fname] = (r[0], row["turn_idx"])
        if cfg.extract_invoice and contains_any(u, ikeys):
            for fname, fire in _INVOICE_ORDER:
                if fields[fname] is None:
                    r = fire(u)
                    if r is not None:
                        fields[fname] = (r[0], row["turn_idx"])
        if fields["vendor_name"] is None:
            v = vendor_candidate(row["conv_id"], u, cfg.vendor_lookup)
            if v is not None:
                fields["vendor_name"] = (v[0], row["turn_idx"])
    out: dict = {"conv_id": rows[0]["conv_id"]}
    for f in FIELD_NAMES:
        out[f] = fields[f][0] if fields[f] else None
        out[f + "_turn"] = fields[f][1] if fields[f] else None
    mean = conf_sum / n if n else 0.0
    out["mean_confidence"] = mean
    out["confidence_fmt"] = f"{mean:.2f}"
    out["n_turns"] = n
    return out


def oracle_run(rows: list[dict], cfg: ExtractConfig | None = None):
    """(turns_out rows sorted by (conv, turn), conv_fields rows sorted by conv)."""
    cfg = cfg or ExtractConfig()
    by_conv: dict[str, list[dict]] = defaultdict(list)
    for r in rows:
        by_conv[r["conv_id"]].append(r)
    turns_out, conv_fields = [], []
    for conv in sorted(by_conv):
        conv_rows = sorted(by_conv[conv], key=lambda r: r["turn_idx"])
        for r in conv_rows:
            t = oracle_turn(r["text"])
            t["conv_id"] = conv
            t["turn_idx"] = r["turn_idx"]
            turns_out.append(t)
        conv_fields.append(oracle_conversation(conv_rows, cfg))
    return turns_out, conv_fields
