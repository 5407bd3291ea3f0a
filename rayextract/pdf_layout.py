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


# --- deterministic dump synthesis for the driver's value-hash oracle -------
# Mirror of html_extract.synth_page: wrap each document's tokens in a
# positional fragment dump whose every coordinate is integer arithmetic on
# (doc_id, line, frag), emit the fragments in a deterministically JUMBLED
# order, and let the real extractor re-derive reading order — so the DuckDB
# oracle can regenerate the expected text and value-hash D1 end to end.


def synth_dump(doc_id: int, text: str) -> tuple[str, int, int]:
    """(jumbled positional dump, n_frags, n_lines). Layout: 8 tokens per
    visual line at y = 40*li + 10 with per-fragment jitter in [-3, 3] (inside
    Y_TOLERANCE); each line splits into 4-token fragments at x = 60 + 150*f
    with jitter in [-5, 5] (x order preserved). Emission order is sorted by
    md5(doc_id:li:f) — reading order must come from the extractor, never
    from arrival order."""
    import hashlib

    toks = text.split()
    frags = []
    for li in range(0, (len(toks) + 7) // 8):
        line = toks[li * 8 : li * 8 + 8]
        for f in range(0, (len(line) + 3) // 4):
            part = " ".join(line[f * 4 : f * 4 + 4])
            y = 40 * li + 10 + (doc_id + li + f) % 7 - 3  # +10: keep y > 0 (wire format is unsigned)
            x = 60 + 150 * f + (doc_id * 3 + li + 5 * f) % 11 - 5
            key = hashlib.md5(f"{doc_id}:{li}:{f}".encode()).hexdigest()
            frags.append((key, f"<<x:{x},y:{y}>>{part}"))
    frags.sort()
    n_lines = (len(toks) + 7) // 8
    return "\n".join(s for _, s in frags), len(frags), n_lines


def reading_order_batch(t):
    """pyarrow batch fn: (doc_id, text) -> (doc_id, n_frags, n_lines,
    extracted). Synthesizes the dump and strips it back IN the task — the
    dump never exists outside the batch fn."""
    import pyarrow as pa

    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    nf, nl, ex = [], [], []
    for doc_id, text in zip(ids, texts):
        dump, n_frags, n_lines = synth_dump(
            doc_id, text if isinstance(text, str) else ""
        )
        got = extract_reading_order(dump)
        nf.append(n_frags)
        nl.append(n_lines)
        ex.append(got)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_frags": pa.array(nf, pa.int64()),
            "n_lines": pa.array(nl, pa.int64()),
            "extracted": pa.array(ex, pa.string()),
        }
    )
