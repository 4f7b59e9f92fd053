"""P2 (part 1) — connected-component labeling.

The reference's page segmentation starts from connected components inside
upstream Tesseract (``FindBlocks`` pipeline — reference:
patches/tesseract.diff:107-151). Reimplemented here as run-length based
4-connectivity CCL, fully vectorized:

  1. horizontal ink runs per row (one diff over the padded mask),
  2. run-to-run adjacency via two global ``searchsorted`` calls on composite
     (row, column) keys — runs are row-major sorted, so interval overlap
     against the previous row is a pair of binary searches, no Python pairs,
  3. component labels by min-label propagation with pointer jumping —
     converges in O(log(component height)) vectorized passes.

Cost is O(runs log runs), independent of page area for blank regions.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Components:
    """Per-component stats; all arrays have length n."""

    left: np.ndarray  # int32, inclusive
    top: np.ndarray
    right: np.ndarray  # int32, inclusive
    bottom: np.ndarray
    area: np.ndarray  # ink pixel count

    @property
    def n(self) -> int:
        return len(self.left)


def _runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract horizontal ink runs: (row, start_col, end_col_exclusive).

    Edge-masked in place on two copies — no padded buffer, no int8 diff
    (those temporaries were ~half the page's memory traffic, which is what
    limits many-worker scaling)."""
    starts_mask = mask.copy()
    starts_mask[:, 1:] &= ~mask[:, :-1]
    ends_mask = mask.copy()
    ends_mask[:, :-1] &= ~mask[:, 1:]
    rows_s, starts = np.nonzero(starts_mask)
    _, ends_incl = np.nonzero(ends_mask)
    # per row both lists are sorted and 1:1 (every run has one start, one end)
    return rows_s.astype(np.int64), starts.astype(np.int64), (ends_incl + 1).astype(np.int64)


def label_components(mask: np.ndarray) -> Components:
    rows, starts, ends = _runs(mask)
    n_runs = len(rows)
    if n_runs == 0:
        empty = np.empty(0, dtype=np.int32)
        return Components(empty, empty, empty, empty, empty)

    w = mask.shape[1] + 2  # key stride: larger than any column value
    # runs are sorted by (row, start); within a row runs are disjoint and
    # ordered, so these composite keys are globally sorted
    key_start = rows * w + starts
    key_end = rows * w + ends
    # for run i, overlapping runs j in the previous row satisfy
    # end_j > start_i and start_j < end_i (4-connectivity column overlap)
    lo = np.searchsorted(key_end, (rows - 1) * w + starts, side="right")
    hi = np.searchsorted(key_start, (rows - 1) * w + ends, side="left")
    cnt = np.maximum(hi - lo, 0)

    # edge list (prev-row run `pa` <-> run `pb`), fully vectorized expansion
    total = int(cnt.sum())
    labels = np.arange(n_runs, dtype=np.int64)
    if total:
        pb = np.repeat(np.arange(n_runs, dtype=np.int64), cnt)
        offsets = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        pa = np.repeat(lo, cnt) + offsets
        # min-label propagation with pointer jumping: labels always point to
        # an equal-or-smaller run index, so label chains shrink monotonically
        while True:
            m = labels.copy()
            np.minimum.at(m, pb, labels[pa])
            np.minimum.at(m, pa, labels[pb])
            m = m[m]  # pointer jumping
            if np.array_equal(m, labels):
                break
            labels = m

    uniq, labels = np.unique(labels, return_inverse=True)
    n = len(uniq)
    left = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    right = np.zeros(n, dtype=np.int64)
    top = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    bottom = np.zeros(n, dtype=np.int64)
    area = np.zeros(n, dtype=np.int64)
    np.minimum.at(left, labels, starts)
    np.maximum.at(right, labels, ends - 1)
    np.minimum.at(top, labels, rows)
    np.maximum.at(bottom, labels, rows)
    np.add.at(area, labels, ends - starts)
    return Components(
        left.astype(np.int32),
        top.astype(np.int32),
        right.astype(np.int32),
        bottom.astype(np.int32),
        area.astype(np.int32),
    )
