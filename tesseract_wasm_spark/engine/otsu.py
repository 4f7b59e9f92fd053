"""P1 — grayscale + Otsu global thresholding.

The reference's first pipeline stage: Tesseract v5.3.0 defaults to Otsu
thresholding on engine init (reference: src/lib.cpp:172-189 SetImage;
thresholded image retrievable via GetThresholdedImage, src/lib.cpp:250).
Reimplemented as vectorized numpy: 256-bin histogram + argmax of inter-class
variance. Integer luma keeps the result bit-deterministic across platforms.
"""

from __future__ import annotations

import numpy as np


def grayscale(img: np.ndarray) -> np.ndarray:
    """uint8[H,W,C] -> uint8[H,W] integer luma ((77R + 150G + 29B) >> 8).

    Single-channel input is returned as a view (no copy). RGBA math runs in
    uint16 (77*255 + 150*255 + 29*255 = 65280 fits), halving the temp traffic
    of a uint32 formulation — this path is bandwidth-critical at 32-way
    concurrency."""
    if img.ndim == 2:
        return img
    if img.shape[2] == 1:
        return img[..., 0]
    acc = img[..., 0].astype(np.uint16) * np.uint16(77)
    acc += img[..., 1].astype(np.uint16) * np.uint16(150)
    acc += img[..., 2].astype(np.uint16) * np.uint16(29)
    return (acc >> 8).astype(np.uint8)


def _hist256(gray: np.ndarray) -> np.ndarray:
    """256-bin histogram via the uint16 pair trick: viewing byte pairs as
    one uint16 halves the elements bincount must cast/scan (the cast to
    intp dominates a plain uint8 bincount); the 256x256 pair table folds
    back exactly (every pixel lands in one row- and one column-sum).
    Identical counts, ~1.4x faster (r06)."""
    flat = gray.reshape(-1)
    n = flat.size
    pairs = flat[: n - (n & 1)].view(np.uint16)
    h16 = np.bincount(pairs, minlength=65536).reshape(256, 256)
    hist = h16.sum(axis=0) + h16.sum(axis=1)
    if n & 1:
        hist[flat[-1]] += 1
    return hist


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's method: threshold t maximizing inter-class variance; pixels
    <= t are ink. Returns -1 for a constant image (no ink)."""
    hist = _hist256(gray).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return -1
    omega = np.cumsum(hist) / total  # class-0 probability up to t
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    if not np.any(sigma_b > 0):
        return -1  # constant / degenerate image: nothing separable
    return int(np.argmax(sigma_b))


def binarize(rgba: np.ndarray) -> np.ndarray:
    """uint8[H,W,4] -> bool[H,W] ink mask (True = ink)."""
    gray = grayscale(rgba)
    t = otsu_threshold(gray)
    if t < 0:
        return np.zeros(gray.shape, dtype=bool)
    return gray <= t
