"""S4 language-model dispatch tests: the pipeline selects the glyph model by
each row's ``lang`` column (the reference hardcodes "eng", src/lib.cpp:138 —
SURVEY §2.1 S4 maps the model axis to a lang-keyed broadcast analog)."""

from __future__ import annotations

import numpy as np

from tesseract_wasm_spark.engine.page import process_page, process_rgba
from tesseract_wasm_spark.fixtures import DEU_PAGE_LINES, expected_text
from tesseract_wasm_spark.font import LANG_CHARSETS, glyph_table
from tesseract_wasm_spark.raster import render_page, render_page_drf


def test_deu_charset_extends_eng_with_shared_ascii():
    eng = glyph_table("eng")
    deu = glyph_table("deu")
    assert set(eng) < set(deu)
    for ch in eng:
        assert (eng[ch] == deu[ch]).all()  # ASCII glyphs shared across models
    for ch in "äöüÄÖÜß":
        assert ch in deu and ch not in eng


def test_deu_glyphs_shift_unique():
    """The extended set keeps the ±DESC-row shift-uniqueness contract that
    the baseline-retry correctness proof relies on."""
    from tesseract_wasm_spark.font import BASELINE_ROW, DESC_BOTTOM, _shifted

    deu = glyph_table("deu")
    desc = DESC_BOTTOM - BASELINE_ROW
    seen = set()
    for cell in deu.values():
        for dy in (-desc, 0, desc):
            b = _shifted(cell, dy).tobytes()
            assert b not in seen
            seen.add(b)


def test_german_page_byte_identical():
    for lines in DEU_PAGE_LINES:
        res = process_rgba(render_page(lines, lang="deu"), lang="deu")
        assert res.page_text == expected_text(lines)


def test_german_page_with_eng_model_misses_umlauts():
    """Dispatch matters: the eng model cannot reproduce umlaut glyphs."""
    lines = DEU_PAGE_LINES[0]
    res = process_rgba(render_page(lines, lang="deu"), lang="eng")
    assert res.page_text != expected_text(lines)


def test_lstm_recognizer_handles_deu():
    lines = DEU_PAGE_LINES[1]
    res = process_page(render_page_drf(lines, lang="deu"), recognizer="lstm", lang="deu")
    assert res.page_text == expected_text(lines)


def test_unknown_lang_falls_back_to_eng():
    res = process_rgba(render_page(["plain ascii line"]), lang="xx")
    assert res.page_text == "plain ascii line\n"


def test_mixed_lang_corpus_distributed(spark):
    """The pipeline dispatches the model per row: a mixed eng/deu pages table
    extracts every url byte-identically."""
    from pyspark.sql import functions as F

    from tesseract_wasm_spark.fixtures import fixtures_df
    from tesseract_wasm_spark.outputs import page_text_df
    from tesseract_wasm_spark.pipeline import ocr_pages

    pages = fixtures_df(spark, n_corpus_pages=4)
    assert pages.filter(F.col("lang") == "deu").count() == len(DEU_PAGE_LINES)
    texts = page_text_df(ocr_pages(pages))
    truth = pages.filter(~F.col("url").contains("/rot-")).select(
        "url", F.col("text").alias("expected")
    )
    joined = texts.join(truth, "url")
    bad = joined.filter(F.col("text_out") != F.col("expected")).collect()
    assert bad == [], bad


def test_charsets_stay_latin1():
    for cs in LANG_CHARSETS.values():
        cs.encode("latin-1")  # must not raise (recognizer decode contract)
