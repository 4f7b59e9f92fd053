"""Committed-golden tests: pinned outputs detect any drift in the rasterizer,
font, or recognizer (the reference's dominant test style — exact expected
values for a fixed fixture, test/ocr-engine-test.js:140-209, 296-307)."""

from __future__ import annotations

import json
from pathlib import Path

from tesseract_wasm_spark.api import createOCREngine
from tesseract_wasm_spark.engine.page import process_page
from tesseract_wasm_spark.fixtures import SMALL_PAGE_LINES
from tesseract_wasm_spark.raster import render_page, render_page_drf
from tesseract_wasm_spark.font import export_model

GOLDEN = Path(__file__).parent / "golden"


def test_text_golden_byte_identical():
    res = process_page(render_page_drf(SMALL_PAGE_LINES))
    assert res.page_text == (GOLDEN / "small-page.txt").read_text()


def test_words_golden_exact():
    res = process_page(render_page_drf(SMALL_PAGE_LINES))
    want = json.loads((GOLDEN / "small-page-words.json").read_text())
    got = [vars(w) for w in res.words]
    assert got == want


def test_hocr_golden_byte_identical():
    eng = createOCREngine()
    eng.loadModel(export_model())
    eng.loadImage(render_page(SMALL_PAGE_LINES))
    assert eng.getHOCR() == (GOLDEN / "small-page.hocr.html").read_text()
