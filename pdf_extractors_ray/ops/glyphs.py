"""Glyph-bitmap rasterizer + template-matching OCR (S9/S16/S17/ST7).

No OCR engine ships in this container, but the OCR *pipeline mechanics*
don't need one: this module rasterizes text onto a synthetic page bitmap
(5x7 glyph cells on a fixed grid) and recovers it with a REAL
template-matching OCR kernel — page binarization, polarity
normalization (S17 preprocessing), orientation detection by trying all
four rotations and scoring template hits (S16 rotate pre-transform),
cell segmentation, and per-cell template lookup (ST7: the template bank
is per-actor state). The glyph shapes themselves are deterministic
hash-derived bitmaps rather than a human-readable typeface — the font is
synthetic, the OCR is not: every kernel step (rot90, thresholding,
grid segmentation, nearest-template match, text reconstruction) is the
actual computation an engine performs on a clean fixed-pitch scan.

Reference semantics: the OCR page reader + searchable-text path
(SURVEY §2.1 S9/S10; ocr-pdf-extractor pipeline) — text out of page
images, then the SAME downstream extraction banks as the text path.
"""

from __future__ import annotations

import hashlib
import string

import numpy as np

GLYPH_H, GLYPH_W = 7, 5
CELL_H, CELL_W = 8, 6  # glyph + 1px inter-glyph gutter

CHARSET = string.ascii_letters + string.digits + ".,:-/()"


def _glyph_bits(ch: str) -> np.ndarray:
    """Deterministic (7, 5) bool bitmap for one glyph: the first 35 bits
    of md5(ch). Injectivity over CHARSET is asserted at import."""
    digest = hashlib.md5(ch.encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    return bits.reshape(GLYPH_H, GLYPH_W).astype(bool)


FONT: dict[str, np.ndarray] = {ch: _glyph_bits(ch) for ch in CHARSET}
FONT[" "] = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)

_TEMPLATES: dict[bytes, str] = {f.tobytes(): ch for ch, f in FONT.items()}
assert len(_TEMPLATES) == len(FONT), "glyph bitmap collision in CHARSET"
assert all(FONT[ch].any() for ch in CHARSET), "glyph indistinguishable from space"


def render_page(text: str, rotate_k: int = 0, invert: bool = False) -> np.ndarray:
    """Rasterize text onto an (h, w, 3) uint8 page: one fixed-pitch cell
    per character, lines padded to equal width; then the scan 'defects' —
    ``rotate_k`` quarter-turns and optional polarity inversion — that the
    OCR kernel must undo."""
    lines = text.split("\n")
    ncols = max((len(ln) for ln in lines), default=0) or 1
    ink = np.zeros((len(lines) * CELL_H, ncols * CELL_W), dtype=bool)
    for r, ln in enumerate(lines):
        for c, ch in enumerate(ln):
            if ch not in FONT:
                raise ValueError(f"unsupported glyph {ch!r}")
            ink[r * CELL_H : r * CELL_H + GLYPH_H, c * CELL_W : c * CELL_W + GLYPH_W] = FONT[ch]
    page = np.where(ink, 255, 0).astype(np.uint8)
    if invert:
        page = 255 - page
    page = np.rot90(page, rotate_k % 4)
    return np.repeat(page[:, :, None], 3, axis=2)


def _read_grid(ink: np.ndarray) -> tuple[str, int, int]:
    """Segment a polarity-normalized ink mask into cells and match each
    against the template bank → (text, non-blank cells, template hits)."""
    rows, cols = ink.shape[0] // CELL_H, ink.shape[1] // CELL_W
    lines, nonblank, hits = [], 0, 0
    for r in range(rows):
        chars = []
        for c in range(cols):
            cell = ink[r * CELL_H : r * CELL_H + GLYPH_H, c * CELL_W : c * CELL_W + GLYPH_W]
            if not cell.any():
                chars.append(" ")
                continue
            nonblank += 1
            ch = _TEMPLATES.get(np.ascontiguousarray(cell).tobytes())
            if ch is not None:
                hits += 1
                chars.append(ch)
            else:
                chars.append(" ")
        lines.append("".join(chars).rstrip())
    return "\n".join(lines), nonblank, hits


def ocr_page(img: np.ndarray) -> dict:
    """Full OCR of one page image: binarize, then jointly score BOTH
    polarities x all four orientations by template hits and read the best
    candidate. Polarity cannot be guessed from the global ink fraction —
    a dense glyph on a tiny page exceeds 50% coverage — but the wrong
    polarity turns every cell into a template miss, so hit count
    discriminates both defects at once.

    Returns ``{"text", "rotation_k", "inverted", "match_rate"}`` where
    ``rotation_k`` is the detected number of quarter-turns the page had
    (i.e. ``rot90(page, -rotation_k)`` restores it) and ``inverted`` is
    whether the page's polarity was flipped (ink dark on bright).
    """
    gray = img[:, :, 0] if img.ndim == 3 else img
    bright = gray > 127
    best = {"text": "", "rotation_k": 0, "inverted": False, "match_rate": 0.0}
    best_hits = -1
    for inverted in (False, True):
        ink = ~bright if inverted else bright
        for k in range(4):
            cand = np.rot90(ink, -k)
            if cand.shape[0] % CELL_H or cand.shape[1] % CELL_W:
                continue
            text, nonblank, hits = _read_grid(cand)
            rate = hits / nonblank if nonblank else 0.0
            if hits > best_hits:
                best_hits = hits
                best = {
                    "text": text,
                    "rotation_k": k,
                    "inverted": inverted,
                    "match_rate": rate,
                }
    return best


class GlyphOcr:
    """Actor-pool OCR stage (ST7): the template bank is per-actor state,
    bound once in ``__init__`` — the same lifecycle a tesseract/model
    handle would have. Input batches carry image payloads in any sniffable
    container (P6 / PNG / baseline JPEG — ``codecs.decode_image``); output
    adds the recovered ``text`` plus the detected scan defects."""

    def __init__(self):
        self.templates = _TEMPLATES  # bound per actor, like a loaded model

    def __call__(self, batch):
        import pandas as pd

        from . import codecs

        out = []
        for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
            r = ocr_page(codecs.decode_image(payload))
            out.append(
                {
                    "doc_id": int(doc_id),
                    "text": r["text"],
                    "rotation_k": r["rotation_k"],
                    "inverted": bool(r["inverted"]),
                    "match_ppm": int(round(r["match_rate"] * 1_000_000)),
                }
            )
        return pd.DataFrame(out)
