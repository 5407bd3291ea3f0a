"""OCR analog: bitmap-font text rendering + template-match decoding.

The reference's core competency is Tesseract reading text out of page
rasters (/root/reference/OCR/Image.cs:20-66 builds the engine,
TextExtraction/Worker.cs:144-200 drives page images through it). This
container has no OCR engine, so the rebuild follows the WAV/BMP real-codec
playbook (multimodal.py): text is rendered DETERMINISTICALLY into genuine
uncompressed 24-bit BMP containers with an original 5x7 dot-matrix font,
deterministic per-glyph noise pixels are added, and an actor-pool decoder
reads the text back OUT of the pixels — blank-column segmentation, row-band
detection, and nearest-template matching under Hamming distance. Because
the noise makes exact template equality fail, the argmin match is
load-bearing: this is a true (if small-alphabet) accuracy-class image->text
operator, and the rendered strings are integer-arithmetic regenerable so
the DuckDB oracle value-hashes the decoded text end to end.

Layout contract (renderer <-> decoder):
  * glyph cells are 6 columns wide (<=5 ink + >=1 blank pitch column);
    a space character is a full 6-column blank cell, so the gap between
    words is >= 6 blank columns while any intra-word gap is <= 5.
  * one text line; margins of 2 px all around; ink=0 on background=255.
  * the decoder derives the 7-row text band BOTTOM-anchored at the global
    ink bounding box's last row — every glyph except '-' has baseline ink,
    so even a lone '.' lands in the right band rows ('-' never appears
    without other glyphs in any fixture).
Noise contract: at most ONE white pixel inside each glyph's own ink
bounding box is flipped to ink, so segment extents never change and a
nearest-template match stays exact while equality match breaks. Decoding
stays unambiguous because every same-width glyph pair is >= 3 Hamming
apart (pinned by tests/test_ocr.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .multimodal import MEDIA_BATCH_SIZE, BmpDecoder, bmp_encode, decode_stage

# ---------------------------------------------------------------------------
# 5x7 dot-matrix font (original glyph designs; '#'=ink)
# ---------------------------------------------------------------------------

_FONT_ROWS: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".####", "#....", "#....", "#....", "#....", "#....", ".####"),
    "D": ("###..", "#..#.", "#...#", "#...#", "#...#", "#..#.", "###.."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".####", "#....", "#....", "#.###", "#...#", "#...#", ".###."),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "#####"),
    "J": ("#####", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "##..#", "#.#.#", "#..##", "#..##", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", ".#.#.", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", ".#.#.", ".#.#.", "..#..", ".#.#.", ".#.#.", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", "#####"),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": ("#####", "...#.", "..#..", "...#.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": ("..###", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "...#.", "###.."),
    "$": ("..#..", ".####", "#.#..", ".###.", "..#.#", "####.", "..#.."),
    "#": (".#.#.", ".#.#.", "#####", ".#.#.", "#####", ".#.#.", ".#.#."),
    "/": ("....#", "...#.", "...#.", "..#..", ".#...", ".#...", "#...."),
    "-": (".....", ".....", ".....", "#####", ".....", ".....", "....."),
    ".": ("..", "..", "..", "..", "..", "##", "##"),
}

GLYPH_H = 7
CELL_W = 6          # 5 ink columns + 1 pitch column
MARGIN = 2
SPACE_GAP = 6       # a decoded gap of >= SPACE_GAP blank columns is a space


def _glyph_array(ch: str) -> np.ndarray:
    rows = _FONT_ROWS[ch]
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


def _crop_cols(g: np.ndarray) -> tuple[np.ndarray, int]:
    """Crop a glyph to its ink column extent; return (pattern, start_col)."""
    cols = np.flatnonzero(g.any(axis=0))
    return g[:, cols[0] : cols[-1] + 1], int(cols[0])


class _TemplateBank:
    """Column-cropped glyph templates grouped by ink width (built once per
    decoder actor — the D4 engine-loaded-once analog of OCR/Image.cs:20).
    Per width the templates are prestacked into one (n_cands, 7, w) bool
    array so a whole group of same-width segments matches in a single
    broadcast-XOR-sum instead of a per-candidate Python loop (the loop was
    90% of decode wall: 1.3M tiny count_nonzero calls for 2k docs)."""

    def __init__(self) -> None:
        self.by_width: dict[int, list[tuple[str, np.ndarray]]] = {}
        for ch in sorted(_FONT_ROWS):
            pat, _ = _crop_cols(_glyph_array(ch))
            self.by_width.setdefault(pat.shape[1], []).append((ch, pat))
        # (chars in lex order, stacked patterns) per width; lex order means
        # argmin's first-minimal-index tie-break == the old loop's strict-<
        # first-candidate tie-break.
        self.stacked: dict[int, tuple[list[str], np.ndarray]] = {
            w: ([ch for ch, _ in cands], np.stack([p for _, p in cands]))
            for w, cands in self.by_width.items()
        }

    def match(self, seg: np.ndarray) -> str:
        """Nearest template by Hamming distance among same-width glyphs;
        ties break to the lexicographically first char (deterministic)."""
        return self.match_many(seg[None, :, :])[0]

    def match_many(self, segs: np.ndarray) -> list[str]:
        """(m, 7, w) same-width segments -> m chars in one vectorized pass."""
        got = self.stacked.get(segs.shape[2])
        if got is None or segs.shape[1] != GLYPH_H:
            return ["?"] * segs.shape[0]
        chars, pats = got
        # (m, 1, 7, w) != (1, n, 7, w) -> (m, n) Hamming distances
        d = (segs[:, None, :, :] != pats[None, :, :, :]).sum(axis=(2, 3))
        return [chars[i] for i in d.argmin(axis=1)]


# ---------------------------------------------------------------------------
# Renderer (text -> real BMP container bytes)
# ---------------------------------------------------------------------------

def render_text_pixels(text: str, noise_key: "int | None" = None) -> np.ndarray:
    """One text line -> (11, 4 + 6*len) uint8 grayscale (255 bg, 0 ink).

    noise_key: when set, flips one white pixel to ink inside each glyph's
    own ink bounding box (position derived from noise_key + glyph index) —
    segment extents are untouched but exact template equality breaks, so
    only a distance-based decode survives.
    """
    h = GLYPH_H + 2 * MARGIN
    w = 2 * MARGIN + CELL_W * len(text)
    img = np.full((h, w), 255, dtype=np.uint8)
    for gi, ch in enumerate(text):
        if ch == " ":
            continue
        g = _glyph_array(ch)  # KeyError on unsupported char: caller's bug
        cell = np.array(g, dtype=bool)
        if noise_key is not None and cell.shape[1] >= 5:
            cols = np.flatnonzero(cell.any(axis=0))
            rows = np.flatnonzero(cell.any(axis=1))
            bw = cols[-1] - cols[0] + 1
            bh = rows[-1] - rows[0] + 1
            k = (noise_key * 131 + gi * 17) % (bw * bh)
            for _ in range(bw * bh):
                r, c = rows[0] + k // bw, cols[0] + k % bw
                if not cell[r, c]:
                    cell[r, c] = True
                    break
                k = (k + 11) % (bw * bh)
        x0 = MARGIN + gi * CELL_W
        sub = img[MARGIN : MARGIN + GLYPH_H, x0 : x0 + cell.shape[1]]
        sub[cell] = 0
    return img


def render_text_bmp(text: str, noise_key: "int | None" = None) -> bytes:
    """Text line -> genuine uncompressed 24-bit BMP bytes (bmp_encode)."""
    return bmp_encode(render_text_pixels(text, noise_key=noise_key))


# ---------------------------------------------------------------------------
# Fixture: deterministic invoice-ish strings a SQL oracle regenerates
# ---------------------------------------------------------------------------

OCR_WORDS = ("TOTAL", "AMOUNT", "INVOICE", "PAID",
             "DUE", "BALANCE", "REFUND", "CREDIT")


def ocr_fixture_text(doc_id: int) -> str:
    """'<WORD> <00042> $<837>.<94>' — every piece is integer arithmetic on
    doc_id, mirrored verbatim by the image_ocr_extract oracle SQL."""
    d = int(doc_id)
    return (
        f"{OCR_WORDS[d % 8]} {d:05d} ${(d * 37) % 1000}.{(d * 7) % 100:02d}"
    )


def synth_ocr_batch(t: pa.Table) -> pa.Table:
    """documents batch -> (media_id, payload) of noisy rendered BMPs."""
    ids = t.column("doc_id").to_numpy()
    payloads = [
        render_text_bmp(ocr_fixture_text(d), noise_key=int(d)) for d in ids
    ]
    return pa.table(
        {
            "media_id": pa.array(ids.astype("int64"), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


# ---------------------------------------------------------------------------
# Decoder (real pixels -> text), actor-pool stage
# ---------------------------------------------------------------------------

class OcrDecoder:
    """Actor-pool image->text stage: BMP container parse (BmpDecoder's
    pure-numpy path), binarize, derive the 7-row text band from the ink
    bounding box, segment glyphs on blank columns (gap >= SPACE_GAP ->
    space), and nearest-template match each segment. Malformed payloads
    quarantine as ocr_text=None / n_glyphs=-1 (Worker.cs:117-125 analog)."""

    def __init__(self) -> None:
        self._bank = _TemplateBank()
        self._bmp = BmpDecoder()

    def decode_pixels(self, gray: np.ndarray) -> str:
        ink = gray < 128
        band_rows = np.flatnonzero(ink.any(axis=1))
        if band_rows.size == 0:
            return ""
        # BOTTOM-anchored 7-row band: every glyph except '-' has baseline
        # ink, so descenderless lines like a bare '.' still land in the
        # right band rows ('-' never appears without other glyphs in any
        # fixture; a line of only dashes is out of contract).
        r0 = max(0, int(band_rows[-1]) - (GLYPH_H - 1))
        band = ink[r0 : r0 + GLYPH_H]
        if band.shape[0] < GLYPH_H:  # image shorter than a glyph: pad top
            band = np.vstack(
                [np.zeros((GLYPH_H - band.shape[0], band.shape[1]), bool), band]
            )
        ink_cols = np.flatnonzero(band.any(axis=0))
        if ink_cols.size == 0:
            return ""
        # maximal runs of consecutive ink columns = glyph segments
        breaks = np.flatnonzero(np.diff(ink_cols) > 1)
        starts = np.r_[ink_cols[0], ink_cols[breaks + 1]]
        ends = np.r_[ink_cols[breaks], ink_cols[-1]] + 1
        widths = ends - starts
        # one vectorized Hamming match per distinct segment width
        chars: list[str] = [""] * len(starts)
        for w in np.unique(widths):
            idx = np.flatnonzero(widths == w)
            segs = np.stack([band[:, starts[i] : ends[i]] for i in idx])
            for i, ch in zip(idx, self._bank.match_many(segs)):
                chars[i] = ch
        out: list[str] = []
        prev_end = None
        for s, e, ch in zip(starts, ends, chars):
            if prev_end is not None and s - prev_end >= SPACE_GAP:
                out.append(" ")
            out.append(ch)
            prev_end = e
        return "".join(out)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts: list[str | None] = []
        counts: list[int] = []
        for payload in t.column("payload").to_pylist():
            try:
                px = self._bmp._decode(payload)  # (h, w, 3) BGR
                txt = self.decode_pixels(px[:, :, 0])
                texts.append(txt)
                counts.append(len(txt.replace(" ", "")))
            except Exception:
                texts.append(None)
                counts.append(-1)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "ocr_text": pa.array(texts, pa.string()),
                "n_glyphs": pa.array(counts, pa.int64()),
            }
        )


def ocr_extract(
    media: "ray.data.Dataset",
    concurrency: "tuple[int, int] | None" = None,
    batch_size: int = MEDIA_BATCH_SIZE,
) -> "ray.data.Dataset":
    """(media_id, payload) BMP table -> (media_id, ocr_text, n_glyphs) via
    the template-match decoder (per-worker cached; see
    multimodal.decode_stage). Payload bytes never cross a shuffle."""
    return decode_stage(
        media, OcrDecoder, concurrency=concurrency, batch_size=batch_size
    )
