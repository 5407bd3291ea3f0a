"""D1 analog — PDF-ish layout parser (reading-order line clustering).

The reference rasterizes PDFs and lets Tesseract recover reading order
(/root/reference/Pdf-To-ImageStream/Convert.cs:9-35 + Worker.cs:144-200, with
sequential line numbering via ``srNo++`` at Worker.cs:155,182). The transcript
analog: a turn's ``text`` may be a pdfminer-style positional dump — fragments
tagged with page-space coordinates, emitted in arbitrary order. This module
re-derives reading order: cluster fragments into lines by y (within a
tolerance band), order lines by y then fragments by x, join.

Wire format (defined by synth.py, one fragment per physical line):

    <<x:INT,y:INT>>fragment text

Fragments whose y differ by <= Y_TOLERANCE belong to one visual line.
"""

from __future__ import annotations

import re

FRAG = re.compile(r"^<<x:(\d+),y:(\d+)>>(.*)$")
Y_TOLERANCE = 6  # px; synthetic layouts jitter y by +-3


def looks_like_pdfish(text: str) -> bool:
    return text.lstrip().startswith("<<x:")


def parse_fragments(text: str) -> list[tuple[int, int, str]]:
    """[(x, y, fragment)] — unparseable lines are skipped (the reference
    skips failed pages but keeps going, Worker.cs:117-125)."""
    out = []
    for line in text.splitlines():
        m = FRAG.match(line.strip())
        if m:
            out.append((int(m.group(1)), int(m.group(2)), m.group(3)))
    return out


def reading_order_lines(text: str) -> list[str]:
    """Cluster fragments into lines, return line texts in reading order."""
    frags = parse_fragments(text)
    if not frags:
        return []
    # sort by y then x; greedy band clustering on y
    frags.sort(key=lambda f: (f[1], f[0]))
    lines: list[list[tuple[int, int, str]]] = []
    band_y = None
    for f in frags:
        if band_y is None or f[1] - band_y > Y_TOLERANCE:
            lines.append([f])
            band_y = f[1]
        else:
            lines[-1].append(f)
    out = []
    for line in lines:
        line.sort(key=lambda f: (f[0], f[1]))
        out.append(" ".join(f[2] for f in line))
    return out


def extract_reading_order(text: str) -> str:
    return "\n".join(reading_order_lines(text))
