"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — run the full OCR extraction pipeline on the
deterministic fixture corpus and return the per-url extracted text joined
against ground truth with a byte-identity verdict column.

queries()/oracle_sql(): see tesseract_wasm_spark/queries.py (registry with
per-entry reference citations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)  # driver-side imports regardless of caller cwd


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the package importable inside executor Python workers even when
    the driver's cwd is not the repo root: ship tesseract_wasm_spark as a
    content-addressed zip via addPyFile (idempotent; same mechanism as
    --py-files). Logic lives in session.ship_package so jobs/extract_job.py
    shares it."""
    from tesseract_wasm_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> ocr_pages -> per-url text, verified byte-identical
    against the corpus ground truth (the north-rule invariant)."""
    _ensure_shipped(spark)
    from tesseract_wasm_spark.fixtures import fixtures_df
    from tesseract_wasm_spark.outputs import page_text_df
    from tesseract_wasm_spark.pipeline import ocr_pages

    pages = fixtures_df(spark, n_corpus_pages=16)
    results = ocr_pages(pages)
    texts = page_text_df(results)
    # rotation fixtures exist for getOrientation only (their ground-truth text
    # is empty by design — reference tests don't assert text on rotated pages,
    # test/ocr-engine-test.js:340-352); error fixtures never reach texts.
    truth = pages.filter(~F.col("url").contains("/rot-")).select(
        "url", F.col("text").alias("expected_text")
    )
    return (
        texts.join(truth, "url")
        .withColumn("byte_identical", F.col("text_out") == F.col("expected_text"))
        .select("url", "text_out", "byte_identical")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tesseract_wasm_spark.queries import queries as _q

    def _wrap(fn):
        def call(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return call

    return {name: _wrap(fn) for name, fn in _q().items()}


def oracle_sql() -> dict[str, str]:
    from tesseract_wasm_spark.queries import oracle_sql as _o

    return _o()
