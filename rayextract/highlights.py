"""K2 — highlight-annotation rendering (the reference's PDF markup emitter).

The reference stamps yellow MARKUP_HIGHLIGHT annotations onto the source PDF
(/root/reference/TextExtraction/Worker.cs:459-528): for every extracted
span's pixel rect it converts 300-DPI pixels to PDF points with the 300/72
constant (Helper.cs:15), flips y against the page height, and emits the quad
in Acrobat's order — ``[right, bottom, left, bottom, right, top, left,
top]`` (Worker.cs:486: "doesn't appear to match the actual spec but is what
Acrobat produces") — colored YELLOW.

Transcripts have no pixel geometry, so the char→pixel layout here is a
DECLARED CONVENTION (fixed-width glyph grid, fixed line height, fixed lines
per page); everything from the pixel rect onward — the /4.166666666666667
division, the ``page_height - y`` flip, the quad ordering, the color and
subtype — is the reference math ported rule-for-rule. The reference computes
in C# ``float``; this port uses float64 (documented divergence, ~1e-7 in
point space).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

# 300 DPI / 72 pt-per-inch (TextExtraction/Helper.cs:15, Worker.cs:465)
PX_PER_POINT = 4.166666666666667
# US-Letter page in points (Worker.cs:505-512 comment block: 612 x 792)
PAGE_W_PT, PAGE_H_PT = 612.0, 792.0

# declared char->pixel layout convention for transcript turns
CHAR_W_PX = 25.0      # one glyph column
LINE_H_PX = 50.0      # one turn line
MARGIN_PX = 100.0
LINES_PER_PAGE = 60   # turn_idx // LINES_PER_PAGE = page (1-based below)


def span_pixel_rect(turn_idx: int, start: int, end: int) -> tuple[int, float, float, float, float]:
    """(page_number, x1, y1, x2, y2) in 300-DPI pixel space for a char span."""
    page = turn_idx // LINES_PER_PAGE + 1  # PDF pages are 1-based
    line = turn_idx % LINES_PER_PAGE
    x1 = MARGIN_PX + start * CHAR_W_PX
    x2 = MARGIN_PX + end * CHAR_W_PX
    y1 = MARGIN_PX + line * LINE_H_PX
    y2 = y1 + LINE_H_PX
    return page, x1, y1, x2, y2


def quad_annotation(
    page: int, x1: float, y1: float, x2: float, y2: float,
    page_h_pt: float = PAGE_H_PT,
) -> dict:
    """One highlight annotation record — Worker.cs:470-493 ported verbatim:
    pixel/constant, y-flip vs page height, quad order [R,B,L,B,R,T,L,T]."""
    new_x1 = x1 / PX_PER_POINT
    new_y1 = page_h_pt - (y1 / PX_PER_POINT)
    new_x2 = x2 / PX_PER_POINT
    new_y2 = page_h_pt - (y2 / PX_PER_POINT)
    # iTextSharp Rectangle(llx,lly,urx,ury): Left=x1, Bottom=y1, Right=x2,
    # Top=y2 — NO normalization in the constructor, so the quad keeps the
    # raw coordinates exactly as the reference emits them
    quad = [new_x2, new_y2, new_x1, new_y2, new_x2, new_y1, new_x1, new_y1]
    return {
        "page": page,
        "rect": [new_x1, new_y1, new_x2, new_y2],
        "quad_points": quad,
        "color": "YELLOW",                 # Worker.cs:492
        "subtype": "MARKUP_HIGHLIGHT",     # Worker.cs:489
    }


def render_highlights(turns: "ray.data.Dataset") -> "ray.data.Dataset":
    """turns (conv_id, turn_idx, spans) -> one flat annotation row per span.

    Columns: conv_id, turn_idx, label, page, x1..y2 (points), q1..q8 (quad),
    color, subtype. Per-span failures are skipped like the reference's
    per-page try/catch (Worker.cs:473-502) — a malformed span must not kill
    the document.
    """

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, turn_idx, spans in zip(
            df["conv_id"], df["turn_idx"], df["spans"]
        ):
            if spans is None or not len(spans):
                continue
            for s in spans:
                try:
                    page, *pix = span_pixel_rect(
                        int(turn_idx), int(s["start"]), int(s["end"])
                    )
                    ann = quad_annotation(page, *pix)
                except Exception:  # reference per-page catch-and-continue
                    continue
                rows.append(
                    (
                        conv_id, int(turn_idx), s["label"], ann["page"],
                        *ann["rect"], *ann["quad_points"],
                        ann["color"], ann["subtype"],
                    )
                )
        cols = (
            ["conv_id", "turn_idx", "label", "page",
             "x1", "y1", "x2", "y2"]
            + [f"q{i}" for i in range(1, 9)]
            + ["color", "subtype"]
        )
        out = pd.DataFrame(rows, columns=cols)
        return out.astype({"turn_idx": "int64", "page": "int64"})

    return turns.map_batches(explode, batch_format="pandas")
