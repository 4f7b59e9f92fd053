"""P3 deskew tests: the engine must detect AND apply page shear before
segmentation (reference applies its deskew vectors during layout analysis —
patches/tesseract.diff:118-119), keeping extraction byte-identical on
skewed scans."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tesseract_wasm_spark.engine.components import label_components
from tesseract_wasm_spark.engine.deskew import detect_shear_per_mille, shear_shifts, unshear
from tesseract_wasm_spark.engine.otsu import binarize
from tesseract_wasm_spark.engine.page import _despeckle, process_page, process_rgba
from tesseract_wasm_spark.fixtures import SMALL_PAGE_LINES, _seeded_lines, expected_text
from tesseract_wasm_spark.raster import render_page, render_page_drf
from tesseract_wasm_spark.font import export_model


def test_clean_page_detects_zero():
    mask = binarize(render_page(SMALL_PAGE_LINES))
    comps = _despeckle(label_components(mask))
    assert detect_shear_per_mille(comps) == 0


@pytest.mark.parametrize("k", [17, -33, 52, -60, 5])
def test_detection_recovers_exact_shear(k):
    mask = binarize(render_page(SMALL_PAGE_LINES, skew_per_mille=k))
    comps = _despeckle(label_components(mask))
    assert detect_shear_per_mille(comps) == k


def test_unshear_is_exact_inverse():
    upright = binarize(render_page(SMALL_PAGE_LINES[:4]))
    for k in (11, -29, 60):
        skewed = binarize(render_page(SMALL_PAGE_LINES[:4], skew_per_mille=k))
        restored = unshear(skewed, k)
        # the restored mask holds the full upright content (padded rows empty)
        h, w = upright.shape
        assert (restored[:h, :w] == upright).all()
        assert not restored[h:, :].any()


@pytest.mark.parametrize("k", [17, -33, 52, -60, 0])
def test_skewed_extraction_byte_identical(k):
    res = process_rgba(render_page(SMALL_PAGE_LINES, skew_per_mille=k))
    assert res.page_text == expected_text(SMALL_PAGE_LINES)
    assert res.skew_degrees == pytest.approx(math.degrees(math.atan(k / 1000)))


def test_seeded_corpus_skew_byte_identical():
    rng = np.random.default_rng(31)
    for _ in range(6):
        lines = _seeded_lines(rng, int(rng.integers(3, 25)))
        k = int(rng.integers(-60, 61))
        res = process_page(render_page_drf(lines, skew_per_mille=k))
        assert res.page_text == expected_text(lines), k


def test_rotated_pages_keep_zero_shear_and_orientation():
    """The score-margin guard must not let rotated content trigger a spurious
    shear (which would perturb orientation detection)."""
    for rot in (90, 180, 270):
        res = process_rgba(render_page(SMALL_PAGE_LINES, rot=rot))
        assert res.skew_degrees == 0.0
        assert (res.rotation, res.orient_confidence) == (rot, 1.0)


def test_sparse_page_skips_detection():
    res = process_rgba(render_page(["ab"]))
    assert res.skew_degrees == 0.0
    assert res.page_text == "ab\n"


def test_hocr_baseline_slope_records_scan_skew():
    from tesseract_wasm_spark.api import createOCREngine

    eng = createOCREngine()
    eng.loadModel(export_model())
    eng.loadImage(render_page(SMALL_PAGE_LINES[:3], skew_per_mille=17))
    h = eng.getHOCR()
    assert "baseline 0.017 " in h
    eng.loadImage(render_page(SMALL_PAGE_LINES[:3]))
    assert "baseline 0.0 " in eng.getHOCR()


def test_skew_with_speckle_noise_byte_identical():
    img = render_page(SMALL_PAGE_LINES, skew_per_mille=25)
    g = img[..., 0].copy()
    rng = np.random.default_rng(9)
    g[(rng.random(g.shape) < 0.002) & (g > 128)] = 40  # pepper specks
    rgba = np.stack([g, g, g, np.full_like(g, 255)], axis=-1)
    res = process_rgba(rgba)
    assert res.page_text == expected_text(SMALL_PAGE_LINES)


def test_shear_shift_table_matches_raster():
    xs = np.arange(0, 2000)
    for k in (-60, -1, 0, 1, 17, 52):
        expect = np.floor(xs * (k / 1000.0) + 0.5).astype(np.int64)
        assert (shear_shifts(xs, k) == expect).all()
