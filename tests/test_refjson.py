"""F12 reference-JSON shape parity (Worker.cs:262,443 / ImageOcr.cs:19-88)."""

import json

import pandas as pd

from rayextract.refjson import add_reference_json, row_to_reference_json


def test_reference_json_shape():
    row = {
        "conv_id": "c1",
        "patient_name": "JANE DOE",
        "patient_name_turn": 3,
        "invoice_number": "4329",
        "invoice_number_turn": 0,
        "gross_total": "$1,000.00",
        "gross_total_turn": 7,
    }
    out = json.loads(row_to_reference_json(row))
    assert set(out) == {"Patient", "Invoice"}
    assert set(out["Invoice"]) == {
        "InvNum", "InvDate", "OrderNum", "OrderDate", "VendorName", "Tax", "Total"
    }
    assert out["Patient"]["Name"] == {"Text": "JANE DOE", "PageNumber": 3, "Rectangle": ""}
    assert out["Invoice"]["InvNum"]["Text"] == "4329"
    assert out["Invoice"]["Total"] == {"Text": "$1,000.00", "PageNumber": 7, "Rectangle": ""}
    # unset fields serialize as empty leaves (Worker.cs:209,287 fresh accumulators)
    assert out["Invoice"]["InvDate"] == {"Text": "", "PageNumber": 0, "Rectangle": ""}
    assert out["Invoice"]["OrderDate"]["Text"] == ""  # E8 no-op stub parity


def test_add_reference_json_batch():
    df = pd.DataFrame(
        {
            "conv_id": ["a", "b"],
            "patient_name": ["X Y", None],
            "patient_name_turn": [1, None],
        }
    )
    out = add_reference_json(df)
    assert out.columns.tolist() == ["conv_id", "output_json"]
    assert json.loads(out["output_json"][0])["Patient"]["Name"]["Text"] == "X Y"
    assert json.loads(out["output_json"][1])["Patient"]["Name"]["Text"] == ""
