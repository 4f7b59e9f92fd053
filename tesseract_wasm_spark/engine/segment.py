"""P2 (part 2) — line and word segmentation + baseline estimation.

Mirrors the reference's PSM_AUTO layout analysis contract (reference:
src/lib.cpp:177-180 SetPageSegMode(PSM_AUTO); AnalyseLayout src/lib.cpp:198-201)
at the granularity the API exposes: text lines and words with bounding boxes
(TextUnit Word | Line — reference: src/lib.cpp:43-46).

Algorithm (deterministic, font-geometry aware — see font.py):
  - lines: components sorted by top, clustered by y-interval overlap (glyph
    cells are CELL_H tall, line pitch leaves >= LINE_GAP blank rows between
    consecutive line bands, so overlap clustering is exact on upright pages).
  - baseline per line: every glyph is one component whose bottom row is either
    the baseline (non-descenders) or baseline + DESC_ROWS (descenders), so the
    baseline is recovered from the component-bottom histogram. This plays the
    role of Tesseract's baseline fitting / GetDeskewVectors (reference:
    patches/tesseract.diff:118-119).
  - words: within a line, components sorted by left edge; a gap of >= ADV
    blank columns separates words (intra-word gaps are at most ADV-1 because
    glyphs are left-aligned in their cells; the space advance guarantees
    inter-word gaps of at least ADV+1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tesseract_wasm_spark.engine.components import Components
from tesseract_wasm_spark.font import ADV, BASELINE_ROW, DESC_BOTTOM

DESC_ROWS = DESC_BOTTOM - BASELINE_ROW  # 3


@dataclass
class Word:
    left: int
    top: int
    right: int
    bottom: int
    comp_idx: list[int] = field(default_factory=list)


@dataclass
class Line:
    top: int
    bottom: int
    baseline: int  # absolute row index of the baseline (bottom ink row of
    # non-descender glyphs)
    words: list[Word] = field(default_factory=list)

    @property
    def left(self) -> int:
        return min(w.left for w in self.words)

    @property
    def right(self) -> int:
        return max(w.right for w in self.words)


def estimate_baseline(bottoms: np.ndarray) -> int:
    """Baseline row from component bottoms. Non-descender glyphs bottom at the
    baseline; descenders exactly DESC_ROWS below it. If both populations are
    present the smaller value is the baseline; otherwise the mode wins."""
    vals, counts = np.unique(bottoms, return_counts=True)
    for v in vals:
        if v + DESC_ROWS in vals:
            return int(v)
    return int(vals[np.argmax(counts)])


def segment(comps: Components) -> list[Line]:
    if comps.n == 0:
        return []
    order = np.argsort(comps.top, kind="stable")
    lines_idx: list[list[int]] = []
    band_bottom = -1
    for i in order:
        if comps.top[i] > band_bottom:
            lines_idx.append([])
            band_bottom = int(comps.bottom[i])
        else:
            band_bottom = max(band_bottom, int(comps.bottom[i]))
        lines_idx[-1].append(int(i))

    lines: list[Line] = []
    for idx in lines_idx:
        idx_arr = np.array(idx)
        lefts = comps.left[idx_arr]
        order_x = np.argsort(lefts, kind="stable")
        idx_sorted = idx_arr[order_x]
        baseline = estimate_baseline(comps.bottom[idx_arr])
        line = Line(
            top=int(comps.top[idx_arr].min()),
            bottom=int(comps.bottom[idx_arr].max()),
            baseline=baseline,
        )
        cur: Word | None = None
        for ci in idx_sorted:
            cl, cr = int(comps.left[ci]), int(comps.right[ci])
            if cur is not None and cl - cur.right - 1 < ADV:
                cur.left = min(cur.left, cl)
                cur.right = max(cur.right, cr)
                cur.top = min(cur.top, int(comps.top[ci]))
                cur.bottom = max(cur.bottom, int(comps.bottom[ci]))
                cur.comp_idx.append(int(ci))
            else:
                cur = Word(cl, int(comps.top[ci]), cr, int(comps.bottom[ci]), [int(ci)])
                line.words.append(cur)
        lines.append(line)
    # reading order: top-to-bottom (already), words left-to-right (already)
    return lines
