"""Distributed-pipeline tests: byte-identity per url, dual-path parity,
skew rebalancing, checkpoint resume, lineage/metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tesseract_wasm_spark import outputs as O
from tesseract_wasm_spark.fixtures import fixtures_df
from tesseract_wasm_spark.pipeline import metrics_df, ocr_pages
from tesseract_wasm_spark.scale import run_with_resume
from tesseract_wasm_spark.font import export_model


@pytest.fixture(scope="module")
def results(spark):
    res = ocr_pages(fixtures_df(spark, n_corpus_pages=8)).persist()
    res.count()
    yield res
    res.unpersist()


@pytest.fixture(scope="module")
def pages(spark):
    return fixtures_df(spark, n_corpus_pages=8)


def _ok_urls(url_col):
    # html payloads go through pipeline.extract_any's webtext branch, not the
    # OCR surface (their byte identity is pinned in tests/test_webtext.py)
    return ~(
        url_col.contains("rot-") | url_col.contains("bad-")
        | url_col.contains("zero-") | url_col.contains("html-") | url_col.contains("pdf-")
        | url_col.contains("pdfz-") | url_col.contains("pdfm-") | url_col.contains("img-")
    )


def test_byte_identity_per_url(results, pages):
    """The north-rule invariant: extracted text byte-identical per url."""
    got = O.page_text_df(results)
    truth = pages.filter(_ok_urls(F.col("url"))).select("url", "text")
    joined = truth.join(got, "url", "left")
    mism = joined.filter(
        F.col("text_out").isNull() | (F.col("text_out") != F.col("text"))
    ).count()
    assert mism == 0
    assert joined.count() == pages.filter(_ok_urls(F.col("url"))).count()


def test_errors_as_values(results):
    # html fixture payloads are error-as-value rows through the OCR-only
    # surface (a mixed crawl must not kill the job); pipeline.extract_any is
    # the dispatcher that routes them to the webtext path instead
    errs = {r["url"].rsplit("/", 1)[-1]: r["error"] for r in O.errors_df(results).collect()}
    assert errs == {
        "bad-buffer": "Image data length does not match width/height",
        "zero-dim": "Image width or height is zero",
        "html-0": "Unsupported image format",
        "html-1": "Unsupported image format",
        "pdf-0": "Unsupported image format",
        "pdf-1": "Unsupported image format",
        "pdfz-0": "Unsupported image format",
        "pdfm-0": "Unsupported image format",
        "pdfz-1": "Unsupported image format",
        "img-png": "Unsupported image format",
        "img-jpeg": "Unsupported image format",
    }


def test_orientation_distributed(results):
    rows = O.orientation_df(results).filter(F.col("url").contains("rot-")).collect()
    assert {(r["url"].rsplit("-", 1)[-1], r["rotation"], r["confidence"]) for r in rows} == {
        ("90", 90, 1.0), ("180", 180, 1.0), ("270", 270, 1.0),
    }


def test_dual_path_page_text(results):
    """P7 both ways: engine string == SQL rollup of words->lines->page."""
    words = O.words_df(results)
    lines = O.lines_df(words)
    sql_text = O.page_text_from_lines(lines)
    direct = O.page_text_df(results).filter(F.col("text_out") != "")
    joined = direct.join(sql_text.withColumnRenamed("text_out", "sql_text"), "url")
    assert joined.count() == direct.count()
    assert joined.filter(F.col("text_out") != F.col("sql_text")).count() == 0


def test_flags_engine_vs_sql(results):
    checked = O.line_flags_check(O.words_df(results).filter(F.col("text") != ""))
    assert checked.filter(F.col("flags") != F.col("flags_sql")).count() == 0


def test_lines_rollup_golden(results):
    from tesseract_wasm_spark.fixtures import SMALL_PAGE_LINES

    lines = (
        O.lines_df(O.words_df(results))
        .filter(F.col("url").endswith("small-page"))
        .orderBy("line_id")
        .collect()
    )
    assert [r["text"] for r in lines] == [ln + "\n" for ln in SMALL_PAGE_LINES]
    for r in lines:
        assert r["left"] < r["right"] and r["top"] < r["bottom"]
        assert r["n_words"] == len(SMALL_PAGE_LINES[r["line_id"]].split())


def test_empty_page_quirk_distributed(results):
    words = O.words_df(results).filter(F.col("url").contains("empty-"))
    per_url = words.groupBy("url").count().collect()
    assert len(per_url) == 3
    assert all(r["count"] == 1 for r in per_url)
    assert words.filter((F.col("text") != "") | (F.col("right") != 0)).count() == 0
    layout = O.layout_df(results).filter(F.col("url").contains("empty-"))
    assert layout.count() == 0


def test_hocr_distributed(results):
    row = O.hocr_df(results).filter(F.col("url").endswith("small-page")).collect()[0]
    h = row["hocr"]
    assert "class='ocr_page' id='page_1'" in h
    assert "x_wconf 100'>Image</span>" in h
    assert h.endswith("</html>")


def test_hocr_empty_page_document(results):
    """A page with zero recognized words yields the same valid empty-page hOCR
    document OCREngine.getHOCR emits (header + bare ocr_page div) — the two
    hOCR surfaces must agree."""
    from tesseract_wasm_spark.api import createOCREngine
    from tesseract_wasm_spark.raster import empty_page

    rows = O.hocr_df(results).filter(F.col("url").contains("empty-100x100")).collect()
    assert len(rows) == 1
    eng = createOCREngine()
    eng.loadModel(export_model())
    eng.loadImage(empty_page(100, 100))
    assert rows[0]["hocr"] == eng.getHOCR()


def test_metrics_lineage(results):
    m = metrics_df(results).collect()
    assert sum(r["pages"] for r in m) == results.count()
    assert all(r["partition_id"] >= 0 for r in m)
    # 2 bad + 2 html + 5 pdf + 2 image payloads through the OCR-only surface
    assert sum(r["errors"] for r in m) == 11


def test_rebalance_partitioning(spark, pages):
    from tesseract_wasm_spark.pipeline import rebalance_pages

    df = rebalance_pages(pages.select("url", "html"), num_partitions=6)
    assert df.rdd.getNumPartitions() == 6


def test_resume_idempotent(spark, pages, tmp_path):
    out = str(tmp_path / "ckpt")
    s1 = run_with_resume(spark, pages, out)
    assert s1["pages"] == pages.count() and s1["resumed"] is False
    # replay: everything already present -> nothing processed, no duplicates
    s2 = run_with_resume(spark, pages, out)
    assert s2["pages"] == 0 and s2["resumed"] is True
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == res.select("url").distinct().count() == pages.count()
    # partial replay: drop half the inputs -> still nothing to do (idempotence)
    s3 = run_with_resume(spark, pages.limit(5), out)
    assert s3["pages"] == 0
    # metrics table exists with per-partition lineage
    met = spark.read.parquet(f"{out}/metrics")
    assert {"partition_id", "pages", "elapsed_ms", "run_id"} <= set(met.columns)


def test_resume_processes_only_new(spark, pages, tmp_path):
    out = str(tmp_path / "ckpt2")
    first = pages.filter(F.col("url").contains("page-0000"))
    n_first = first.count()
    assert n_first > 0
    run_with_resume(spark, first, out)
    s2 = run_with_resume(spark, pages, out)
    assert s2["pages"] == pages.count() - n_first
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == pages.count()


def test_extract_all_shares_one_result(results):
    from tesseract_wasm_spark.outputs import extract_all

    surfaces = extract_all(results)
    assert set(surfaces) == {
        "results", "words", "lines", "text", "layout", "orientation", "errors", "hocr",
    }
    assert surfaces["words"].count() > 0
    assert surfaces["hocr"].count() > 0
    # full OCR run: boxes come from the words (layout_boxes intentionally empty)
    assert surfaces["layout"].count() == surfaces["words"].filter(
        (F.col("text") != "") | (F.col("right") != 0)
    ).count()


def test_cost_rebalance_beats_salt_on_skew(spark):
    """Sorted round-robin packing bounds per-partition cost under heavy tail."""
    import tesseract_wasm_spark.fixtures as fx
    from tesseract_wasm_spark.pipeline import rebalance_pages

    pages = fx.fixtures_df(spark, n_corpus_pages=200).select("url", "html")

    def max_partition_cost(df):
        sizes = (
            df.withColumn("_c", F.length("html"))
            .select(F.spark_partition_id().alias("p"), "_c")
            .groupBy("p").agg(F.sum("_c").alias("cost"))
            .collect()
        )
        costs = [r["cost"] for r in sizes]
        return max(costs) / (sum(costs) / len(costs))

    cost_ratio = max_partition_cost(rebalance_pages(pages, 8, strategy="cost"))
    salt_ratio = max_partition_cost(rebalance_pages(pages, 8, strategy="salt"))
    # deterministic comparison on the same skewed input: packing must beat
    # uniform salting and keep the heaviest partition near the mean
    assert cost_ratio <= salt_ratio
    assert cost_ratio < 1.35


def test_resume_is_mode_scoped(spark, pages, tmp_path):
    """A layout-only run must not mark urls complete for full extraction."""
    out = str(tmp_path / "ckpt3")
    sub = pages.limit(6)
    s1 = run_with_resume(spark, sub, out, with_text=False)
    assert s1["pages"] == 6
    s2 = run_with_resume(spark, sub, out, with_text=True)  # full run still due
    assert s2["pages"] == 6
    s3 = run_with_resume(spark, sub, out, with_text=True)  # now resumed
    assert s3["pages"] == 0
    res = spark.read.parquet(f"{out}/results")
    assert set(r["mode"] for r in res.select("mode").distinct().collect()) == {"layout", "full"}


def test_results_bucket_layout(spark, pages, tmp_path):
    """Results land hive-partitioned by url_bucket = pmod(xxhash64(url), 256)
    so the 10^12-row resume anti-join keys on (url_bucket, url) — the layout
    an Iceberg bucket partition spec turns into a storage-partitioned join."""
    import os

    out = str(tmp_path / "bl")
    run_with_resume(spark, pages.limit(6), out)
    subdirs = [d for d in os.listdir(f"{out}/results") if d.startswith("url_bucket=")]
    assert len(subdirs) >= 2  # 6 urls spread over >= 2 of 256 buckets
    s2 = run_with_resume(spark, pages.limit(6), out)
    assert s2["pages"] == 0 and s2["resumed"] is True


def test_resume_pre_bucketing_fallback(spark, pages, tmp_path):
    """A results table written BEFORE the bucketed layout (no url_bucket
    column) must still resume correctly through the url-only anti-join."""
    from tesseract_wasm_spark.pipeline import ocr_pages as _ocr

    out = str(tmp_path / "old")
    first = pages.limit(5)
    # simulate the old layout: write results directly, unbucketed
    res = _ocr(first)
    (res.withColumn("run_id", F.lit("legacy")).withColumn("mode", F.lit("full"))
        .write.mode("append").parquet(f"{out}/results"))
    s = run_with_resume(spark, pages, out)
    assert s["resumed"] is True
    assert s["pages"] == pages.count() - 5
    got = spark.read.parquet(f"{out}/results")
    assert got.select("url").distinct().count() == pages.count()
