"""F12 — reference-shaped JSON serialization of extraction output.

The reference persists its field record as a JSON string in the ``Output``
column (/root/reference/TextExtraction/Worker.cs:262,443: ``JsonConvert.
SerializeObject(textExtraction)``) with the ``TextExtractionFields`` shape
(Model/ImageOcr.cs:19-88): ``{Patient: {Name, BirthDate}, Invoice: {InvNum,
InvDate, OrderNum, OrderDate, VendorName, Tax, Total}}``, each leaf
``{Text, PageNumber, Rectangle}``.

Arrow holds these natively (schema.CONV_FIELDS_SCHEMA), so this module exists
only for parity checks / export to consumers of the reference's format. The
locator mapping: ``PageNumber`` <- winning ``turn_idx`` (ordering carrier,
SURVEY.md §1), ``Rectangle`` <- "" (char spans replace pixel boxes).
"""

from __future__ import annotations

import json

import pandas as pd

_LEAF_EMPTY = {"Text": "", "PageNumber": 0, "Rectangle": ""}

# conv_fields column -> (section, reference property name, ImageOcr.cs line)
_FIELD_MAP = {
    "patient_name": ("Patient", "Name"),          # ImageOcr.cs:33-38
    "patient_birthdate": ("Patient", "BirthDate"),  # ImageOcr.cs:39-43
    "invoice_number": ("Invoice", "InvNum"),      # ImageOcr.cs:50-55
    "invoice_date": ("Invoice", "InvDate"),       # ImageOcr.cs:56-60
    "order_number": ("Invoice", "OrderNum"),      # ImageOcr.cs:61-65
    "vendor_name": ("Invoice", "VendorName"),     # ImageOcr.cs:71-75
    "gross_total": ("Invoice", "Total"),          # ImageOcr.cs:81-87
}


def row_to_reference_json(row: dict) -> str:
    """One conv_fields row -> the reference's Output JSON string shape.

    Unset fields serialize as the empty leaf (the reference news up empty
    field objects per document, Worker.cs:209,287); OrderDate and Tax have no
    extractor in the reference (E8 stub / data-only class) and stay empty.
    """
    out = {
        "Patient": {"Name": dict(_LEAF_EMPTY), "BirthDate": dict(_LEAF_EMPTY)},
        "Invoice": {
            k: dict(_LEAF_EMPTY)
            for k in ("InvNum", "InvDate", "OrderNum", "OrderDate", "VendorName",
                      "Tax", "Total")
        },
    }
    for col, (section, prop) in _FIELD_MAP.items():
        v = row.get(col)
        if v is not None and not (isinstance(v, float) and pd.isna(v)):
            t = row.get(col + "_turn")
            out[section][prop] = {
                "Text": v,
                "PageNumber": int(t) if t is not None else 0,
                "Rectangle": "",
            }
    return json.dumps(out, separators=(",", ":"))


def add_reference_json(df: pd.DataFrame) -> pd.DataFrame:
    """Batch fn: conv_fields frame -> (conv_id, output_json)."""
    return pd.DataFrame(
        {
            "conv_id": df["conv_id"],
            "output_json": [
                row_to_reference_json(r) for r in df.to_dict("records")
            ],
        }
    )
