"""P5/P6 — glyph sequence recognition with per-word confidence.

Plays the role of the reference's LSTM line recognizer + CTC decode
(reference: src/lib.cpp:325-336 Recognize; LSTM-only because the legacy engine
is compiled out, Makefile:108 -DDISABLED_LEGACY_ENGINE=ON). The environment has
no trained model, so recognition inverts the project's own deterministic font
(font.py): each word is sliced into fixed-advance glyph cells aligned to the
line baseline and matched against the full template set in one batched matmul
(numpy BLAS — the analog of the reference's SIMD dot-product path,
src/tesseract-init.js:30-39 ENV.DOTPRODUCT="sse").

Confidence semantics follow the reference: a score in [0, 1] per word
(reference converts Tesseract's percentage via ``Confidence(level) * 0.01`` —
src/lib.cpp:302-304). An exact template match scores 1.0; otherwise the best
template's Jaccard overlap is used (and the replacement char is emitted when
overlap < 0.5), so garbage input degrades gracefully instead of failing.
"""

from __future__ import annotations

import numpy as np

from tesseract_wasm_spark.engine.segment import Line
from tesseract_wasm_spark.font import (
    ADV,
    BASELINE_ROW,
    CELL_H,
    CELL_W,
    DESC_BOTTOM,
    REPLACEMENT_CHAR,
    template_matrix,
)

MIN_PARTIAL_OVERLAP = 0.5


def _extract_cells(mask: np.ndarray, lines: list[Line]) -> tuple[np.ndarray, list[tuple[int, int, int]]]:
    """Slice every word of every line into glyph cells.

    Returns (cells [N, CELL_H*CELL_W] float32, index [(line_i, word_i, n_cells)]).
    Cells are aligned vertically by the line baseline: rows
    [baseline - BASELINE_ROW, baseline + (CELL_H - 1 - BASELINE_ROW)].
    """
    h, w = mask.shape
    cells = []
    index = []
    for li, line in enumerate(lines):
        band_top = line.baseline - BASELINE_ROW
        for wi, word in enumerate(line.words):
            width = word.right - word.left + 1
            n = max(1, -(-width // ADV))  # ceil
            for k in range(n):
                x0 = word.left + k * ADV
                cell = np.zeros((CELL_H, CELL_W), dtype=bool)
                r0, r1 = band_top, band_top + CELL_H
                c0, c1 = x0, x0 + CELL_W
                sr0, sr1 = max(r0, 0), min(r1, h)
                sc0, sc1 = max(c0, 0), min(c1, w)
                if sr0 < sr1 and sc0 < sc1:
                    cell[sr0 - r0 : sr1 - r0, sc0 - c0 : sc1 - c0] = mask[sr0:sr1, sc0:sc1]
                cells.append(cell.reshape(-1))
            index.append((li, wi, n))
    if not cells:
        return np.zeros((0, CELL_H * CELL_W), dtype=np.float32), index
    return np.stack(cells).astype(np.float32), index


def recognize_words(mask: np.ndarray, lines: list[Line]) -> list[list[tuple[str, float]]]:
    """Per line, per word: (text, confidence). Batched over the whole page."""
    templates, chars = template_matrix()
    t = templates.astype(np.float32)  # [G, P]
    cells, index = _extract_cells(mask, lines)
    results: list[list[tuple[str, float]]] = [[] for _ in lines]
    if len(index) == 0:
        return results
    # hamming distance via two matmuls: |c XOR t| = c@(1-t)^T + (1-c)@t^T
    inter = cells @ t.T  # [N, G] intersection counts
    cell_ink = cells.sum(axis=1, keepdims=True)
    tmpl_ink = t.sum(axis=1, keepdims=True).T
    union = cell_ink + tmpl_ink - inter
    hamming = union - inter
    best = np.argmin(hamming, axis=1)
    n_cells_total = cells.shape[0]
    best_h = hamming[np.arange(n_cells_total), best]
    with np.errstate(divide="ignore", invalid="ignore"):
        jacc = np.where(union[np.arange(n_cells_total), best] > 0,
                        inter[np.arange(n_cells_total), best]
                        / np.maximum(union[np.arange(n_cells_total), best], 1e-9),
                        0.0)
    pos = 0
    for li, wi, n in index:
        glyphs = []
        confs = []
        for k in range(pos, pos + n):
            if cells[k].sum() == 0:
                glyphs.append(REPLACEMENT_CHAR)
                confs.append(0.0)
            elif best_h[k] == 0:
                glyphs.append(chars[best[k]])
                confs.append(1.0)
            elif jacc[k] >= MIN_PARTIAL_OVERLAP:
                glyphs.append(chars[best[k]])
                confs.append(float(jacc[k]))
            else:
                glyphs.append(REPLACEMENT_CHAR)
                confs.append(float(jacc[k]))
        pos += n
        results[li].append(("".join(glyphs), float(np.mean(confs))))
    return results
