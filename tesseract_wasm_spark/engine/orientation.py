"""P10 — orientation detection (0/90/180/270 degrees clockwise).

The reference detects orientation with Leptonica's ``pixOrientDetect`` on the
thresholded image — ascender/descender asymmetry of Latin text — because
Tesseract's own OSD needs the legacy engine that is compiled out (reference:
src/lib.cpp:242-288, comment at 243-249). Its decision tree, reproduced here
exactly (src/lib.cpp:270-287):

    if |up_conf| - |left_conf| > 5.0:  rotation = 0 if up_conf > 0 else 180
    else:                              rotation = 90 if left_conf > 0 else 270

with confidence 1 on success and {rotation 0, confidence 0} on detection
failure (src/lib.cpp:264-268).

Our up/left confidences: segment the ink mask (and its 90°-CCW rotation) into
text lines; for lines whose band height is plausible for a single text line,
count ink above the x-height band (ascenders) vs below the baseline
(descenders): score = (asc - desc) / sqrt(asc + desc), Leptonica's z-score
shape — evidence grows with page size. English text has far more ascender than
descender ink, so the upright axis scores strongly positive, the 180° flip
strongly negative, and a sideways page — whose y-band "lines" are implausibly
short — scores ~0.

All counting is whole-line-strip numpy row sums (no per-component work); the
caller passes the already-computed segmentation for the upright axis so only
the 90° axis costs an extra labeling pass.
"""

from __future__ import annotations

import numpy as np

from tesseract_wasm_spark.engine.components import label_components
from tesseract_wasm_spark.engine.segment import Line, segment
from tesseract_wasm_spark.font import BASELINE_ROW, CELL_H, XHEIGHT_TOP

DECISION_MARGIN = 5.0  # reference: src/lib.cpp:280 "fabs(up_confidence) - fabs(left_confidence) > 5.0"
MIN_VALID_INK_FRACTION = 0.5
MIN_LINE_HEIGHT = CELL_H - XHEIGHT_TOP  # 8: a line with at least one ascender
MAX_LINE_HEIGHT = CELL_H  # 11: full ascender+descender band
# SCALE calibrates our hash-glyph font's weaker ascender/descender asymmetry
# (3-row asc vs 3-row desc bands, ~50% ink density) to the magnitude range
# Leptonica's confidences reach on natural fonts, so the reference's literal
# 5.0 axis margin (src/lib.cpp:280) stays meaningful.
SCALE = 2.5


def updown_score(mask: np.ndarray, lines: list[Line] | None = None) -> float:
    """Ascender-vs-descender z-score over plausible text-line strips."""
    if lines is None:
        lines = segment(label_components(mask))
    if not lines:
        return 0.0
    # one row-sum pass over the whole mask serves every line strip
    row_ink = mask.sum(axis=1, dtype=np.int64)
    total_ink = int(row_ink.sum())
    if total_ink == 0:
        return 0.0
    asc = desc = 0
    valid_ink = 0
    for line in lines:
        height = line.bottom - line.top + 1
        if not (MIN_LINE_HEIGHT <= height <= MAX_LINE_HEIGHT) or len(line.words) < 2:
            continue
        xheight_top = line.baseline - (BASELINE_ROW - XHEIGHT_TOP)  # baseline - 4
        strip = row_ink[line.top : line.bottom + 1]
        rows = np.arange(line.top, line.bottom + 1)
        asc += int(strip[rows < xheight_top].sum())
        desc += int(strip[rows > line.baseline].sum())
        valid_ink += int(strip.sum())
    if valid_ink / total_ink < MIN_VALID_INK_FRACTION:
        return 0.0
    return float(SCALE * (asc - desc) / np.sqrt(asc + desc + 1.0))


#: orientation detection samples a center band of at most this many rows per
#: axis — a dozen text lines carry all the ascender/descender signal needed,
#: so detection cost is constant in page size (the reference's pixOrientDetect
#: similarly subsamples via its mincount threshold)
MAX_BAND = 256
_CROP_TRIGGER = 320


def _center_rows(mask: np.ndarray) -> np.ndarray:
    h = mask.shape[0]
    if h <= _CROP_TRIGGER:
        return mask
    mid = h // 2
    return mask[mid - MAX_BAND // 2 : mid + MAX_BAND // 2, :]


def orientation_scores(mask: np.ndarray,
                       lines: list[Line] | None = None) -> tuple[float, float]:
    """The two axis scores the decision tree consumes: (up_conf, left_conf).

    ``lines``: the page's already-computed upright segmentation (reused for
    up_conf when the page is small enough to score whole — the reference
    similarly runs OSD on the already-thresholded image, src/lib.cpp:250-261);
    each axis scores a center band so cost is bounded for large pages.
    Exposed separately so the scores can be snapshotted and the decision tree
    re-derived independently (the driver-gate oracle runs decide_orientation
    as SQL over a committed scores golden — queries.SQL_OCR_ORIENTATION)."""
    if mask.shape[0] <= _CROP_TRIGGER:
        up_conf = updown_score(mask, lines)
    else:
        up_conf = updown_score(_center_rows(mask))
    # CCW rotation makes a 90°-CW page upright; crop its rows = page columns
    left_conf = updown_score(_center_rows(np.rot90(mask, k=1)))
    return up_conf, left_conf


def decide_orientation(up_conf: float, left_conf: float,
                       margin: float = DECISION_MARGIN) -> tuple[int, float]:
    """The reference decision tree (src/lib.cpp:264-287) over the two axis
    scores: -> (rotation in {0, 90, 180, 270}, confidence in {0.0, 1.0}).
    ``margin`` is the up-vs-left decision margin (P11
    twspark_orientation_margin; reference literal 5.0, src/lib.cpp:280)."""
    if max(abs(up_conf), abs(left_conf)) < 1.0:
        return 0, 0.0  # detection failed (reference: src/lib.cpp:264-268)
    if abs(up_conf) - abs(left_conf) > margin:
        return (0 if up_conf > 0 else 180), 1.0
    return (90 if left_conf > 0 else 270), 1.0


def detect_orientation(mask: np.ndarray, lines: list[Line] | None = None,
                       *, margin: float = DECISION_MARGIN) -> tuple[int, float]:
    """-> (rotation in {0, 90, 180, 270}, confidence in {0.0, 1.0})."""
    up_conf, left_conf = orientation_scores(mask, lines)
    return decide_orientation(up_conf, left_conf, margin)
