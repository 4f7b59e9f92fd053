"""P3 — skew detection AND application.

The reference applies the deskew vectors it estimates during layout analysis
(patches/tesseract.diff:118-119 ``GetDeskewVectors(&deskew_, &reskew_)``), so
a slightly-rotated scan — the normal case for real paper — still segments and
recognizes cleanly. This module is the Spark engine's analog:

  - ``detect_shear_per_mille``: projection-profile search (the approach of
    Leptonica's pixFindSkew, which the reference's Tesseract build links):
    for each candidate slope k/1000, undo the per-column vertical shift and
    score how sharply the component bottoms concentrate; the true slope
    maximizes the concentration.  Candidates are scanned in 0, +1, -1, ...
    order so a clean page deterministically resolves to k = 0, and the best
    candidate must beat the k = 0 score by a margin — ambiguous content
    (rotated pages, sparse pages) keeps k = 0 rather than applying a spurious
    shear.
  - ``unshear``: apply the inverse per-column shift to the binary mask.  The
    shift table round(x * k / 1000) is the exact same integer function the
    synthetic rasterizer uses, so at the detected k the deskewed mask is a
    pixel-perfect reconstruction of the upright render (byte-identity holds
    through recognition).

Both are whole-array numpy ops; detection is one [n_candidates, n_components]
broadcast + bincount, application one fancy-indexed gather.
"""

from __future__ import annotations

import numpy as np

from tesseract_wasm_spark.engine.components import Components

#: +-60/1000 ~= +-3.4 degrees: the range scanners realistically produce and
#: the range our fixtures exercise (the reference's deskew likewise handles
#: small rotations; page-level 90/180/270 is orientation detection's job)
MAX_SHEAR_PER_MILLE = 60

#: the winning candidate must concentrate component bottoms at least this much
#: better than no-shear; below the margin the page keeps k = 0 (guards rotated
#: or sparse pages against spurious shears)
MIN_SCORE_RATIO = 1.10

#: pages with fewer components carry too little signal to deskew safely
MIN_COMPONENTS = 12


def shear_shifts(xs: np.ndarray, k: int) -> np.ndarray:
    """Per-column vertical shift of a k/1000 shear — the SAME integer
    function the rasterizer applies (raster.render_page), so detection at the
    true k inverts the render exactly."""
    return np.floor(xs * (k / 1000.0) + 0.5).astype(np.int64)


#: r06: process-global cache of the per-column shift table — the
#: floor(x*k/1000 + 0.5) float evaluation over the [n_candidates, n_comps]
#: matrix was ~40% of detection cost and depends only on (k, x); a gather
#: from a precomputed table (grown on demand to the widest page seen, same
#: formula via shear_shifts so values are bit-identical) replaces it.
_SHIFT_TABLE: dict[int, np.ndarray] = {}


def _shift_table(k_max: int, width: int) -> np.ndarray:
    tbl = _SHIFT_TABLE.get(k_max)
    if tbl is None or tbl.shape[1] < width:
        ks = np.zeros(2 * k_max + 1, dtype=np.int64)
        ks[1::2] = np.arange(1, k_max + 1)
        ks[2::2] = -np.arange(1, k_max + 1)
        xs = np.arange(max(width, 2048), dtype=np.int64)
        # int32 throughout the detection hot path: shifts/bottoms/histogram
        # indices all fit comfortably (values < 2^17), halving the [k, n]
        # temporaries' memory traffic; detections are integer-exact either way
        tbl = np.floor(xs[None, :] * (ks[:, None] / 1000.0) + 0.5).astype(np.int32)
        _SHIFT_TABLE[k_max] = tbl
    return tbl


def detect_shear_per_mille(comps: Components, *, k_max: int = MAX_SHEAR_PER_MILLE) -> int:
    """Estimate the page shear as an integer slope in 1/1000 rise-per-pixel.

    Projection-profile search: score(k) = sum over rows of count^2 of
    shear-corrected component bottoms (maximal when bottoms collapse onto the
    baseline grid). Vectorized over all candidates at once."""
    if comps.n < MIN_COMPONENTS:
        return 0
    xc = ((comps.left + comps.right) // 2).astype(np.int64)
    bottoms = comps.bottom.astype(np.int32)
    # candidate order 0, +1, -1, +2, ... -> ties resolve to the smallest |k|
    ks = np.zeros(2 * k_max + 1, dtype=np.int64)
    ks[1::2] = np.arange(1, k_max + 1)
    ks[2::2] = -np.arange(1, k_max + 1)
    adj = bottoms[None, :] - _shift_table(k_max, int(xc.max()) + 1)[:, xc]
    adj -= adj.min()
    width = int(adj.max()) + 1
    flat = (
        np.arange(len(ks), dtype=np.int32)[:, None] * np.int32(width) + adj
    ).ravel()
    hist = np.bincount(flat, minlength=len(ks) * width).reshape(len(ks), width)
    scores = (hist.astype(np.int64) ** 2).sum(axis=1)
    best = int(np.argmax(scores))
    if ks[best] != 0 and scores[best] < MIN_SCORE_RATIO * scores[0]:
        return 0
    return int(ks[best])


def unshear(mask: np.ndarray, k: int) -> np.ndarray:
    """Undo a k/1000 shear on a binary mask: column x moves up by
    round(x*k/1000) (normalized so the minimum shift is 0, i.e. the result is
    only ever translated vertically as a whole — translation is invisible to
    segmentation, which works in per-line coordinates)."""
    h, w = mask.shape
    s = shear_shifts(np.arange(w, dtype=np.int64), k)
    s -= s.min()
    rows = np.arange(h, dtype=np.int64)[:, None] + s[None, :]
    valid = rows < h
    out = np.zeros_like(mask)
    rows_c = np.minimum(rows, h - 1)
    out[:, :] = mask[rows_c, np.arange(w)[None, :]]
    out[~valid] = False
    return out
