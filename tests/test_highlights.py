"""K2 quad emitter: the reference's pixel→point + y-flip + Acrobat quad
order (Worker.cs:459-528), pinned with hand-computed golden values."""

import pandas as pd
import ray.data as rd

from rayextract.highlights import (
    PX_PER_POINT,
    quad_annotation,
    render_highlights,
    span_pixel_rect,
)


def test_reference_math_golden():
    # Worker.cs:515-518 comment block example (note: the reference comment
    # itself miscomputes 1526/4.1667 as 326.24 — the true quotient is 366.24;
    # the CODE divides, so we pin the arithmetic, not the comment typo)
    assert round(1526 / PX_PER_POINT, 2) == 366.24
    ann = quad_annotation(1, 1526.0, 552.0, 2308.0, 603.0)
    x1, y1, x2, y2 = ann["rect"]
    assert round(x1, 2) == 366.24 and round(x2, 2) == 553.92
    # y-flip against the 792pt page
    assert round(y1, 2) == round(792 - 132.48, 2)
    assert round(y2, 2) == round(792 - 144.72, 2)
    # Acrobat order [R, B, L, B, R, T, L, T] with the raw (unnormalized)
    # rectangle corners, exactly as the reference emits them
    assert ann["quad_points"] == [x2, y2, x1, y2, x2, y1, x1, y1]
    assert ann["color"] == "YELLOW" and ann["subtype"] == "MARKUP_HIGHLIGHT"


def test_span_layout_and_paging():
    page, x1, y1, x2, y2 = span_pixel_rect(0, 0, 4)
    assert (page, x1, x2) == (1, 100.0, 200.0)
    assert (y1, y2) == (100.0, 150.0)
    # line 60 wraps to page 2, line 0
    page2, _, y1b, _, _ = span_pixel_rect(60, 0, 1)
    assert page2 == 2 and y1b == 100.0


def test_render_skips_empty_and_flattens():
    turns = rd.from_pandas(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c2"],
                "turn_idx": [0, 3],
                "spans": [
                    [{"label": "PERSON", "start": 2, "end": 5, "text": "abc"}],
                    [],
                ],
            }
        )
    )
    out = render_highlights(turns).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["label"] == "PERSON" and r["page"] == 1
    assert r["q1"] == r["x2"] and r["q8"] == r["y1"]
