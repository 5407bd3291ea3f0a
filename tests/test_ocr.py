"""OCR analog (rayextract/ocr.py): font integrity, render/decode roundtrip,
noise tolerance, glyph-boundary segmentation cases, quarantine, Ray e2e."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayextract.ocr import (
    _FONT_ROWS,
    _TemplateBank,
    _glyph_array,
    OcrDecoder,
    ocr_extract,
    ocr_fixture_text,
    render_text_bmp,
    render_text_pixels,
    synth_ocr_batch,
)


# ---- font integrity ---------------------------------------------------------

def test_font_shapes_and_contiguous_columns():
    for ch, rows in _FONT_ROWS.items():
        assert len(rows) == 7, ch
        w = len(rows[0])
        assert all(len(r) == w for r in rows), ch
        g = _glyph_array(ch)
        assert g.any(), ch
        cols = np.flatnonzero(g.any(axis=0))
        # segmentation relies on no glyph having an internal blank column
        assert (np.diff(cols) == 1).all(), f"{ch!r} has internal blank column"


def test_font_min_pairwise_hamming_3():
    """One flipped noise pixel moves a glyph 1 from its template and at
    least 2 from every other same-width template — the argmin stays exact
    iff every same-width pair is >= 3 apart."""
    bank = _TemplateBank()
    for w, items in bank.by_width.items():
        for (c1, p1), (c2, p2) in itertools.combinations(items, 2):
            d = int(np.count_nonzero(p1 != p2))
            assert d >= 3, (c1, c2, d)


# ---- roundtrip --------------------------------------------------------------

def test_clean_roundtrip_full_charset():
    dec = OcrDecoder()
    full = "ABCDEFGHIJKLMNOPQRSTUVWXYZ 0123456789 $#/-."
    assert dec.decode_pixels(render_text_pixels(full)) == full


def test_noisy_roundtrip_is_exact_and_noise_is_real():
    dec = OcrDecoder()
    for d in (0, 1, 7, 42, 499, 4096, 99999):
        txt = ocr_fixture_text(d)
        clean = render_text_pixels(txt)
        noisy = render_text_pixels(txt, noise_key=d)
        assert (clean != noisy).any(), d  # the noise actually flipped pixels
        assert dec.decode_pixels(noisy) == txt, d


def test_noise_breaks_exact_equality_match():
    """If the decoder required template equality instead of argmin, noisy
    glyphs would not match: assert at least one noisy segment differs from
    its own template (the argmin is load-bearing)."""
    bank = _TemplateBank()
    img = render_text_pixels("TOTAL", noise_key=3)
    ink = img < 128
    band = ink[2:9]
    t_pat = dict(bank.by_width[5])["T"]
    seg = band[:, 2:7]  # first glyph cell
    assert (seg != t_pat).any()


# ---- glyph-boundary segmentation cases -------------------------------------

def test_boundary_cases():
    dec = OcrDecoder()
    cases = [
        "",                # no ink at all
        "A",               # single glyph
        ".",               # narrow glyph alone
        "..",              # adjacent narrow glyphs: gap 4 < space gap
        ". .",             # narrow glyphs across a space: gap 10 >= space gap
        "A.",              # wide then narrow
        ".A",              # narrow then wide
        "1111",            # repeated glyph, no merge
        "A B",             # single space between wide glyphs
        "$0.00",           # the money tail shape
        "II",              # serif-I pair: full-width bars must not merge
    ]
    for txt in cases:
        assert dec.decode_pixels(render_text_pixels(txt)) == txt, repr(txt)


def test_leading_trailing_spaces_are_invisible():
    # spaces carry no ink: decode is the stripped text (documented contract)
    dec = OcrDecoder()
    assert dec.decode_pixels(render_text_pixels(" A ")) == "A"


# ---- quarantine -------------------------------------------------------------

def test_malformed_payload_quarantines():
    dec = OcrDecoder()
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"not a bmp", render_text_bmp("OK")],
                                pa.binary()),
        }
    )
    out = dec(t)
    assert out.column("ocr_text").to_pylist() == [None, "OK"]
    assert out.column("n_glyphs").to_pylist() == [-1, 2]


# ---- Ray e2e ---------------------------------------------------------------

def test_ocr_extract_e2e(ray_session):
    import ray.data as rd

    docs = rd.from_pandas(pd.DataFrame({"doc_id": list(range(24))}))
    media = docs.map_batches(synth_ocr_batch, batch_format="pyarrow")
    out = ocr_extract(media).to_pandas().sort_values("media_id")
    want = [ocr_fixture_text(d) for d in range(24)]
    assert out["ocr_text"].tolist() == want
    assert (out["n_glyphs"] == [len(w.replace(" ", "")) for w in want]).all()
