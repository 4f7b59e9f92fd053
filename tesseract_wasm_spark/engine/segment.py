"""P2 (part 2) — line and word segmentation + baseline estimation.

Mirrors the reference's PSM_AUTO layout analysis contract (reference:
src/lib.cpp:177-180 SetPageSegMode(PSM_AUTO); AnalyseLayout src/lib.cpp:198-201)
at the granularity the API exposes: text lines and words with bounding boxes
(TextUnit Word | Line — reference: src/lib.cpp:43-46).

Algorithm (deterministic, font-geometry aware — see font.py; vectorized):
  - lines: components sorted by top; a new line starts where a component's top
    exceeds the running max bottom of everything above it (text lines are
    vertically separated by >= LINE_GAP blank rows, so the global
    maximum.accumulate is exact on upright pages).
  - baseline per line: every glyph is one component whose bottom row is either
    the baseline (non-descenders) or baseline + DESC_ROWS (descenders), so the
    baseline is recovered from the component-bottom histogram. This plays the
    role of Tesseract's baseline fitting / GetDeskewVectors (reference:
    patches/tesseract.diff:118-119).
  - words: within a line, components sorted by left edge; a gap of >= ADV
    blank columns separates words (intra-word gaps are at most ADV-1 because
    glyphs are left-aligned in their cells; the space advance guarantees
    inter-word gaps of at least ADV+1). Vectorized via maximum.accumulate of
    right edges + cumsum of break flags.
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
    #: recognition anchor: ``left`` snapped to the line's dominant pen phase
    #: (mod ADV). On clean renders equals ``left``; under specks that extend a
    #: word's ink box, the phase consensus of the other words recovers the
    #: true glyph grid. The bbox fields stay the observed ink bounds.
    pen_left: int = -1


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
    best_v, best_support = None, -1
    lookup = dict(zip(vals.tolist(), counts.tolist()))
    for v, c in lookup.items():
        partner = lookup.get(v + DESC_ROWS)
        if partner is not None and 2 * c + partner > best_support:
            # baseline-row bottoms weighted double: non-descender glyphs always
            # dominate a real text line, so a speck pairing with the true
            # baseline row can't outvote the true (baseline, descender) pair
            best_v, best_support = v, 2 * c + partner
    if best_v is not None:
        return int(best_v)
    return int(vals[np.argmax(counts)])


def estimate_skew_degrees(comps: Components, lines: list[Line]) -> float:
    """P3 — page skew estimate (reference: GetDeskewVectors inside layout
    analysis, patches/tesseract.diff:118-119). Least-squares slope of
    baseline-row component bottoms against x, averaged over lines weighted by
    component count; synthetic fixtures are skew-free so tests pin ~0, and the
    estimate is emitted per page for observability at scale."""
    num = 0.0
    den = 0.0
    for line in lines:
        xs: list[float] = []
        ys: list[float] = []
        for word in line.words:
            # use word bboxes (bottom at the line baseline for non-descender
            # words); descender-bottomed words are excluded by the filter
            if word.bottom == line.baseline:
                xs.append((word.left + word.right) / 2.0)
                ys.append(float(word.bottom))
        if len(xs) < 2:
            continue
        x = np.asarray(xs)
        y = np.asarray(ys)
        vx = ((x - x.mean()) ** 2).sum()
        if vx <= 0:
            continue
        slope = (((x - x.mean()) * (y - y.mean())).sum()) / vx
        num += slope * len(xs)
        den += len(xs)
    if den == 0:
        return 0.0
    return float(np.degrees(np.arctan(num / den)))


#: minimum blank-column run that counts as a column gutter: wider than any
#: intra-line word gap the renderer can produce with <=2 consecutive spaces
#: (max ~17px), so single-column text never splits spuriously
MIN_GUTTER = 3 * ADV


def find_blocks(comps: Components, *, min_gutter: int = MIN_GUTTER) -> list[np.ndarray]:
    """Column-block detection — the analog of the reference's FindBlocks
    (patches/tesseract.diff:107-151, Tesseract's ColumnFinder): a full-height
    blank vertical band of >= min_gutter columns splits the page into careas.

    Returns a list of component index arrays, one per block, ordered left to
    right; a single-block page returns one array with every index. The caller
    is expected to reject degenerate splits (a real column has >= 2 lines) —
    see page.process_rgba."""
    if comps.n == 0:
        return []
    w = int(comps.right.max()) + 2
    cover = np.zeros(w + 1, dtype=np.int64)
    np.add.at(cover, comps.left, 1)
    np.add.at(cover, comps.right + 1, -1)
    occupied = np.cumsum(cover)[:-1] > 0
    occ_idx = np.flatnonzero(occupied)
    lo, hi = int(occ_idx[0]), int(occ_idx[-1])
    # blank runs strictly inside the content span
    inside = ~occupied[lo : hi + 1]
    if not inside.any():
        return [np.arange(comps.n)]
    d = np.diff(inside.astype(np.int8), prepend=0, append=0)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    cuts = [lo + (s + e) // 2 for s, e in zip(starts, ends) if e - s >= min_gutter]
    if not cuts:
        return [np.arange(comps.n)]
    xc = (comps.left + comps.right) // 2
    block_of = np.searchsorted(np.asarray(cuts), xc, side="left")
    return [np.flatnonzero(block_of == b) for b in range(len(cuts) + 1)]


def subset(comps: Components, idx: np.ndarray) -> Components:
    return Components(
        comps.left[idx], comps.top[idx], comps.right[idx],
        comps.bottom[idx], comps.area[idx],
    )


def segment(comps: Components) -> list[Line]:
    if comps.n == 0:
        return []
    order = np.argsort(comps.top, kind="stable")
    tops = comps.top[order]
    bottoms = comps.bottom[order]
    # line break where a component starts below everything seen so far
    run_max_bottom = np.maximum.accumulate(bottoms)
    lbreaks = np.empty(len(order), dtype=bool)
    lbreaks[0] = True
    lbreaks[1:] = tops[1:] > run_max_bottom[:-1]
    line_of = np.empty(comps.n, dtype=np.int64)
    line_of[order] = np.cumsum(lbreaks) - 1
    n_lines = int(line_of[order[-1]] + 1)

    # global (line, left) ordering; segmented running-max of right edges via
    # the per-line offset trick (offsets dominate any earlier segment's max)
    order2 = np.lexsort((comps.left, line_of))
    li2 = line_of[order2]
    lefts = comps.left[order2].astype(np.int64)
    rights = comps.right[order2].astype(np.int64)
    ctops = comps.top[order2].astype(np.int64)
    cbots = comps.bottom[order2].astype(np.int64)
    big = np.int64(1) << 32
    runmax = np.maximum.accumulate(rights + li2 * big) - li2 * big
    new_line = np.empty(len(order2), dtype=bool)
    new_line[0] = True
    new_line[1:] = li2[1:] != li2[:-1]
    wbreaks = new_line.copy()
    wbreaks[1:] |= lefts[1:] - runmax[:-1] - 1 >= ADV
    wids = np.cumsum(wbreaks) - 1
    n_words = int(wids[-1] + 1)

    imax = np.iinfo(np.int64).max
    wl = np.full(n_words, imax); wt = np.full(n_words, imax)
    wr = np.full(n_words, -1); wb = np.full(n_words, -1)
    np.minimum.at(wl, wids, lefts)
    np.minimum.at(wt, wids, ctops)
    np.maximum.at(wr, wids, rights)
    np.maximum.at(wb, wids, cbots)
    word_line = li2[wbreaks]  # line id of each word (its first component)

    # per-line stats
    lt = np.full(n_lines, imax); lb = np.full(n_lines, -1)
    np.minimum.at(lt, li2, ctops)
    np.maximum.at(lb, li2, cbots)

    # vectorized baseline per line (same rule as estimate_baseline): histogram
    # of bottoms relative to line top; among values whose +DESC_ROWS twin also
    # occurs, the best-supported pair wins (count + twin count — a lone noise
    # blob can't hijack the baseline); else the mode.
    bins = 64
    rel = np.minimum(cbots - lt[li2], bins - 1 - DESC_ROWS)
    counts = np.bincount(li2 * bins + rel, minlength=n_lines * bins).reshape(n_lines, bins)
    exists = counts > 0
    pair_support = np.where(
        exists[:, : bins - DESC_ROWS] & exists[:, DESC_ROWS:],
        2 * counts[:, : bins - DESC_ROWS] + counts[:, DESC_ROWS:],
        0,
    )
    has_pair = pair_support.any(axis=1)
    baseline_rel = np.where(
        has_pair, np.argmax(pair_support, axis=1), np.argmax(counts, axis=1)
    )
    baselines = lt + baseline_rel

    lines = [
        Line(top=int(lt[li]), bottom=int(lb[li]), baseline=int(baselines[li]))
        for li in range(n_lines)
    ]
    for wi in range(n_words):
        lines[word_line[wi]].words.append(
            Word(left=int(wl[wi]), top=int(wt[wi]), right=int(wr[wi]), bottom=int(wb[wi]))
        )
    # pen-phase consensus per line: word starts are congruent mod ADV on a
    # rendered page; snap each word's recognition anchor to the line's mode
    # phase so a single speck can't shift a word's whole glyph grid
    for line in lines:
        phase_counts = np.bincount([w.left % ADV for w in line.words], minlength=ADV)
        phase = int(np.argmax(phase_counts))
        for w in line.words:
            delta = (w.left - phase + ADV // 2) % ADV - ADV // 2
            w.pen_left = w.left - delta
    # reading order: lines top-to-bottom, words left-to-right (by construction)
    return lines
