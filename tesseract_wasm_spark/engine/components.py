"""P2 (part 1) — connected-component labeling.

The reference's page segmentation starts from connected components inside
upstream Tesseract (``FindBlocks`` pipeline — reference:
patches/tesseract.diff:107-151). Reimplemented here as run-length based
4-connectivity CCL: horizontal ink runs are extracted fully vectorized, runs in
adjacent rows are linked by interval overlap (vectorized searchsorted), and a
small union-find over run indices produces components. Cost is O(runs), not
O(pixels), which keeps the Python-side loop tiny even for dense pages.
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
    """Extract horizontal ink runs: (row, start_col, end_col_exclusive)."""
    h, w = mask.shape
    padded = np.zeros((h, w + 2), dtype=bool)
    padded[:, 1:-1] = mask
    diff = np.diff(padded.astype(np.int8), axis=1)
    rows_s, starts = np.nonzero(diff == 1)
    rows_e, ends = np.nonzero(diff == -1)
    # starts/ends are aligned per row by construction of diff
    return rows_s.astype(np.int32), starts.astype(np.int32), ends.astype(np.int32)


def label_components(mask: np.ndarray) -> Components:
    rows, starts, ends = _runs(mask)
    n_runs = len(rows)
    if n_runs == 0:
        empty = np.empty(0, dtype=np.int32)
        return Components(empty, empty, empty, empty, empty)

    parent = np.arange(n_runs, dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, parent[i]
        return root

    # link runs in adjacent rows with column overlap (4-connectivity)
    row_breaks = np.searchsorted(rows, np.arange(rows[-1] + 2))
    for r in range(1, rows[-1] + 1):
        a0, a1 = row_breaks[r - 1], row_breaks[r]
        b0, b1 = row_breaks[r], row_breaks[r + 1]
        if a0 == a1 or b0 == b1:
            continue
        # for each run b in row r, overlapping runs a in row r-1 satisfy
        # a.start < b.end and a.end > b.start; runs within a row are sorted
        lo = np.searchsorted(ends[a0:a1], starts[b0:b1], side="right")
        hi = np.searchsorted(starts[a0:a1], ends[b0:b1], side="left")
        for bi in range(b1 - b0):
            for ai in range(lo[bi], hi[bi]):
                ra, rb = find(a0 + ai), find(b0 + bi)
                if ra != rb:
                    parent[rb] = ra

    roots = np.fromiter((find(i) for i in range(n_runs)), dtype=np.int64, count=n_runs)
    uniq, labels = np.unique(roots, return_inverse=True)
    n = len(uniq)
    left = np.full(n, np.iinfo(np.int32).max, dtype=np.int32)
    right = np.zeros(n, dtype=np.int32)
    top = np.full(n, np.iinfo(np.int32).max, dtype=np.int32)
    bottom = np.zeros(n, dtype=np.int32)
    area = np.zeros(n, dtype=np.int32)
    np.minimum.at(left, labels, starts)
    np.maximum.at(right, labels, ends - 1)
    np.minimum.at(top, labels, rows)
    np.maximum.at(bottom, labels, rows)
    np.add.at(area, labels, ends - starts)
    return Components(left, top, right, bottom, area)
