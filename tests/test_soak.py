"""Opt-in soak test: large-corpus extraction with full byte-identity verify.

Not part of the default gate (runtime ~25 s at 32 cores, more at CI
parallelism); run with SPARK_GRAFT_SOAK=1. Round-1 recorded result:
49,152/49,152 pages byte-identical, 0 errors, 2,162 pages/s at local[32]
including the verification join.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tesseract_wasm_spark.fixtures import corpus_df
from tesseract_wasm_spark.pipeline import ocr_pages


@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_SOAK"), reason="set SPARK_GRAFT_SOAK=1")
def test_soak_byte_identity(spark):
    n_pages = int(os.environ.get("SPARK_GRAFT_SOAK_PAGES", "8192"))
    pages = corpus_df(spark, n_pages, seed=13, partitions=64).persist()
    n = pages.count()
    res = ocr_pages(pages, with_orientation=False)
    agg = (
        pages.select("url", "text")
        .join(res.select("url", "page_text", "error"), "url")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("page_text") == F.col("text"), 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
        .collect()[0]
    )
    assert (agg["n"], agg["ok"], agg["errors"]) == (n, n, 0)
    pages.unpersist()


@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_SOAK"), reason="set SPARK_GRAFT_SOAK=1")
def test_soak_mixed_extraction(spark):
    """Volume soak for the fused extract_any path: a mixed corpus (50% DRF
    images, 25% HTML articles, 25% PDFs incl. FlateDecode and mixed show
    operators) must come back byte-identical to ground truth for EVERY url,
    with zero error rows."""
    from tesseract_wasm_spark.fixtures import mixed_corpus_df
    from tesseract_wasm_spark.pipeline import extract_any

    n_pages = int(os.environ.get("SPARK_GRAFT_SOAK_MIXED_PAGES", "8192"))
    pages = mixed_corpus_df(spark, n_pages, seed=29, partitions=64).persist()
    n = pages.count()
    out = extract_any(pages)
    agg = (
        pages.select("url", "text")
        .join(out, "url")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("text_out") == F.col("text"), 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
            F.count_distinct("kind").alias("kinds"),
        )
        .collect()[0]
    )
    assert (agg["n"], agg["ok"], agg["errors"], agg["kinds"]) == (n, n, 0, 3)
    pages.unpersist()


@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_SOAK"), reason="set SPARK_GRAFT_SOAK=1")
def test_soak_degraded_recovery(spark):
    """Volume soak for the degraded-scan recovery tier: every page is a
    box-blurred (defocused) scan; the count-threshold recovery in
    engine/recognize.py must still return byte-identical text for EVERY url
    with zero error rows (goes through the same ocr_pages path as clean
    pages — no special-casing in the pipeline)."""
    from tesseract_wasm_spark.fixtures import degraded_corpus_df

    n_pages = int(os.environ.get("SPARK_GRAFT_SOAK_DEGRADED_PAGES", "4096"))
    pages = degraded_corpus_df(spark, n_pages, seed=31, partitions=64).persist()
    n = pages.count()
    res = ocr_pages(pages, with_orientation=False)
    agg = (
        pages.select("url", "text")
        .join(res.select("url", "page_text", "error"), "url")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("page_text") == F.col("text"), 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
        .collect()[0]
    )
    assert (agg["n"], agg["ok"], agg["errors"]) == (n, n, 0)
    pages.unpersist()
