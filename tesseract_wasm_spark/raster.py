"""Synthetic page rasterizer — renders text into DRF page images.

Plays the role of the reference's test fixtures (`test/small-test-page.jpg`,
`test/test-page.jpg` — real scanned pages): a deterministic, pure-numpy
renderer whose output the OCR pipeline must invert byte-identically.

Layout model:
  - fixed margins, fixed line pitch (CELL_H + LINE_GAP)
  - pen x advances ADV per character (space = one blank advance)
  - ink is near-black on near-white, so Otsu binarization has a bimodal
    histogram to split (reference pipeline stage P1, SURVEY.md §2.2)
"""

from __future__ import annotations

import numpy as np

from tesseract_wasm_spark import drf
from tesseract_wasm_spark.font import ADV, BASELINE_ROW, CELL_H, CELL_W, glyph_table

MARGIN = 8
LINE_GAP = 7
LINE_PITCH = CELL_H + LINE_GAP

INK = 20  # ink gray level
PAPER = 245  # paper gray level


def render_page(lines: list[str], *, rot: int = 0, channels: int = 4,
                skew_per_mille: int = 0, lang: str = "eng") -> np.ndarray:
    """Render text lines to uint8[H, W, channels] (4 = RGBA like the
    reference's ImageData input, 1 = grayscale — the at-scale storage format).
    ``rot`` in {0,90,180,270} rotates the page content clockwise (mirrors the
    reference's metamorphic orientation test, test/ocr-engine-test.js:340-352,
    which rotates the fixture with sharp before calling getOrientation).
    ``skew_per_mille`` shears the page by k/1000 rise-per-pixel (~0.057° per
    unit): column x shifts down by round(x*k/1000) — the small-rotation model
    the engine's deskew stage (engine/deskew.py) must invert."""
    table = glyph_table(lang)
    n_cols = max((len(ln) for ln in lines), default=0)
    w = 2 * MARGIN + max(1, n_cols * ADV)
    h = 2 * MARGIN + max(1, len(lines) * LINE_PITCH - LINE_GAP)
    img = np.full((h, w), PAPER, dtype=np.uint8)
    for i, line in enumerate(lines):
        top = MARGIN + i * LINE_PITCH
        for j, ch in enumerate(line):
            if ch == " " or ch not in table:
                continue
            x = MARGIN + j * ADV
            cell = table[ch]
            block = img[top : top + CELL_H, x : x + CELL_W]
            block[cell] = INK
    if skew_per_mille:
        img = _shear(img, skew_per_mille)
    if rot:
        img = np.rot90(img, k=(-rot // 90) % 4)  # numpy rot90 is CCW; rot is CW
    if channels == 1:
        return np.ascontiguousarray(img)[:, :, None]
    rgba = np.empty((*img.shape, 4), dtype=np.uint8)
    rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = img
    rgba[..., 3] = 255
    return rgba


def _shear(img: np.ndarray, k: int) -> np.ndarray:
    """Vertical shear: column x shifts down by round(x*k/1000); the canvas
    grows to hold the shifted content (paper-filled)."""
    h, w = img.shape
    s = np.floor(np.arange(w) * (k / 1000.0) + 0.5).astype(np.int64)
    s -= s.min()
    out = np.full((h + int(s.max()), w), PAPER, dtype=np.uint8)
    rows = np.arange(h)[:, None] + s[None, :]
    out[rows, np.arange(w)[None, :]] = img
    return out


def render_page_drf(lines: list[str], *, rot: int = 0, channels: int = 1,
                    skew_per_mille: int = 0, lang: str = "eng") -> bytes:
    """DRF payload for the corpus; grayscale by default (see drf.py note)."""
    return drf.encode(
        render_page(lines, rot=rot, channels=channels,
                    skew_per_mille=skew_per_mille, lang=lang)
    )


def render_columns(columns: list[list[str]], *, gutter_chars: int = 4,
                   rot: int = 0, channels: int = 4, skew_per_mille: int = 0,
                   lang: str = "eng") -> np.ndarray:
    """Multi-column page: columns side by side separated by a blank gutter of
    ``gutter_chars`` advances (>= the engine's MIN_GUTTER so block detection
    splits them). Reading order ground truth = all of column 0's lines, then
    column 1's, ... (expected_text of the concatenated line lists)."""
    widths = [max((len(ln) for ln in col), default=1) for col in columns]
    n_rows = max((len(col) for col in columns), default=0)
    merged = []
    for i in range(n_rows):
        parts = []
        for col, wd in zip(columns, widths):
            s = col[i] if i < len(col) else ""
            parts.append(s.ljust(wd + gutter_chars))
        merged.append("".join(parts).rstrip())
    return render_page(merged, rot=rot, channels=channels,
                       skew_per_mille=skew_per_mille, lang=lang)


def render_columns_drf(columns: list[list[str]], **kw) -> bytes:
    return drf.encode(render_columns(columns, channels=kw.pop("channels", 1), **kw))


def empty_page(w: int, h: int) -> np.ndarray:
    """All-white page (reference emptyImage(), test/ocr-engine-test.js:33-44)."""
    rgba = np.full((h, w, 4), 255, dtype=np.uint8)
    return rgba


def expected_word_boxes(lines: list[str]) -> list[dict]:
    """Ground-truth word geometry for golden tests — computed from layout
    constants, independent of the OCR pipeline."""
    from tesseract_wasm_spark.font import glyph_ink_width, _class_range  # noqa: PLC0415

    out = []
    for li, line in enumerate(lines):
        top_of_line = MARGIN + li * LINE_PITCH
        words = _split_words(line)
        for wi, (start_col, word) in enumerate(words):
            left = MARGIN + start_col * ADV
            right = left + (len(word) - 1) * ADV + glyph_ink_width(word[-1]) - 1
            tops = [_class_range(c)[0] for c in word]
            bots = [_class_range(c)[1] for c in word]
            out.append(
                {
                    "line_id": li,
                    "word_id": wi,
                    "text": word,
                    "left": left,
                    "top": top_of_line + min(tops),
                    "right": right,
                    "bottom": top_of_line + max(bots),
                    "baseline": top_of_line + BASELINE_ROW,
                }
            )
    return out


def degrade_boxblur(img: np.ndarray, passes: int = 1) -> np.ndarray:
    """Deterministic 3x3 box-blur degradation of a rendered page — the
    mildly-defocused-scan fixture (the reference's real-photo fixtures,
    test/small-frog.jpg etc., carry optical blur the synthetic renderer
    doesn't; this adds the same class of degradation deterministically).

    Each interior pixel becomes the float mean of its 3x3 neighborhood,
    truncated back to uint8 (edge rows/cols keep their original values).
    On a two-level (INK/PAPER) render the blurred value is strictly
    monotone in the 3x3 ink count, so *any* global threshold downstream
    turns the blur into a count-threshold morphology of the clean ink mask
    — exactly the family the recognizer's degraded-scan tier
    (engine/recognize.py `_degraded_retry`) inverts.
    """
    out = img
    for _ in range(passes):
        a = out.astype(np.float32)
        b = a.copy()
        b[1:-1, 1:-1] = (
            a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
            + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
            + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:]
        ) / 9.0
        out = np.clip(b, 0, 255).astype(np.uint8)
    if img.ndim == 3 and img.shape[2] == 4:
        out[..., 3] = img[..., 3]  # alpha is not an ink channel
    return out


def degrade_page_drf(payload: bytes, passes: int = 1) -> bytes:
    """DRF payload -> box-blurred DRF payload (see degrade_boxblur)."""
    return drf.encode(degrade_boxblur(drf.decode(payload), passes=passes))


def _split_words(line: str) -> list[tuple[int, str]]:
    words = []
    col = 0
    for token in line.split(" "):
        if token:
            words.append((col, token))
        col += len(token) + 1
    return words
