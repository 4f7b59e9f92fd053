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


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's method: threshold t maximizing inter-class variance; pixels
    <= t are ink. Returns -1 for a constant image (no ink)."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
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
