"""The Spark extraction pipeline: pages table -> per-url OCR results.

Architecture (SURVEY.md §3.4): the driver plays the reference's main thread,
executors its workers, Arrow IPC its postMessage channel. The entire per-page
pipeline (decode -> Otsu -> CC segmentation -> recognition -> orientation) runs
inside ONE ``mapInPandas`` pass so that text, boxes, hOCR and orientation are
all derived from a single computation — the Spark analog of the reference's
``layout_analysis_done_``/``ocr_done_`` memoization (reference:
src/lib.cpp:325-336; SURVEY.md §4 O2).

Vectorization note: Arrow moves batches JVM->Python zero-copy; within a batch
the per-page orchestration is a thin Python loop (pages are the natural batch
unit — each is ~10^5-10^6 pixels), and ALL pixel/glyph math inside is numpy:
binarization, CCL and recognition are whole-page array ops, recognition in
particular one matmul per page (the analog of the reference's SIMD dot-product
lever, src/tesseract-init.js:30-39).

Scale design (the 100 TB view):
  - the extraction map is embarrassingly parallel: no shuffle at all unless
    skew rebalancing is requested; downstream relational ops shuffle only on
    (url) / (url, line_id) keys.
  - skew (O10): page byte-size is heavy-tailed; ``rebalance_pages`` salts by
    xxhash64(url) into uniform partitions, and at cluster scale AQE's
    coalescing/skew handling refines it at runtime.
  - lineage/metrics (O9/P13): every result row carries the executor partition
    id, input batch ordinal and wall-time of its batch; ``metrics_df`` rolls
    them into a per-partition metrics table (the analog of the reference's
    progress channel, src/ocr-client.ts:95-107).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

WORD_FIELDS = (
    "word_id int, line_id int, left int, top int, right int, bottom int, "
    "flags int, confidence double, text string, baseline int, block_id int"
)
LAYOUT_FIELDS = "left int, top int, right int, bottom int, flags int"

RESULT_DDL = (
    "url string, lang string, width int, height int, error string, "
    "rotation int, orient_confidence double, skew_degrees double, "
    f"words array<struct<{WORD_FIELDS}>>, "
    f"layout_boxes array<struct<{LAYOUT_FIELDS}>>, "
    "page_text string, "
    "partition_id int, batch_seq int, batch_elapsed_ms double, batch_pages int"
)


def rebalance_pages(
    df: DataFrame,
    num_partitions: int | None = None,
    *,
    strategy: str = "salt",
) -> DataFrame:
    """Explicit skew handling (north rule). Two strategies:

    - ``salt`` (default): uniform-salt shuffle on xxhash64(url) — heavy pages
      spread evenly in expectation instead of clustering by crawl append
      order; AQE handles the residual tail. One cheap shuffle; the right
      default at 100 TB.
    - ``cost``: sorted round-robin bin packing — rank pages by descending
      byte size and assign rank % P, so every partition receives a near-equal
      *total* cost even under extreme heavy-tail skew (the biggest pages land
      in distinct partitions by construction). Costs a global sort, so use it
      when stragglers are observed in the metrics table rather than
      unconditionally; at 10^12 rows the sort is a sampled range partition —
      still one extra shuffle.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    if strategy == "cost":
        from pyspark.sql import Window  # noqa: PLC0415

        rank = F.row_number().over(
            Window.orderBy(F.desc(F.length("html")), F.asc("url"))
        )
        # bin layout: high digit = round-robin partition index (spreads the
        # heaviest pages across partitions), low digit subdivides within it so
        # the range sampler's boundary error moves only ~1/8 of a partition's
        # cost. Hash partitioning on the bin would collide bins; range keeps
        # consecutive bins together.
        sub = 8
        part_idx = (rank - 1) % num_partitions
        sub_idx = F.floor((rank - 1) / num_partitions) % sub
        return (
            df.withColumn("_bin", (part_idx * sub + sub_idx).cast("int"))
            .repartitionByRange(num_partitions, "_bin")
            .drop("_bin")
        )
    return df.repartition(num_partitions, F.xxhash64("url"))


def ocr_pages(
    pages: DataFrame,
    *,
    with_text: bool = True,
    with_orientation: bool = True,
    recognizer: str = "template",
    rebalance: bool = True,
    rebalance_strategy: str = "salt",
    num_partitions: int | None = None,
    variables: dict[str, str] | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text?, lang?) -> one result row per url.

    ``with_text=False`` is the reference's layout-only cheap path
    (getBoundingBoxes with no model — src/lib.cpp:197-203): recognition is
    skipped entirely, the moral equivalent of column pruning through an
    opaque UDF (SURVEY.md §4 O3).

    ``variables`` is the validated P11 parameter store (config.VariableStore
    — whitelist, interword-space preservation, engine knobs); values are
    validated on the driver and captured by the task closure, the distributed
    analog of the reference's per-engine setVariable (src/lib.cpp:150-170).
    """
    if variables is not None:
        from tesseract_wasm_spark.config import VariableStore  # noqa: PLC0415

        store = VariableStore()
        for name, value in variables.items():
            store.set(name, value)  # raises with reference message on unknown
        variables = store.as_dict()
    cols = ["url", "html"] + (["lang"] if "lang" in pages.columns else [])
    src = pages.select(*cols)  # column pruning before the shuffle: never move text/warc_ts
    if "lang" not in pages.columns:
        src = src.withColumn("lang", F.lit("eng"))
    if rebalance:
        src = rebalance_pages(src, num_partitions, strategy=rebalance_strategy)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imports inside the worker: keeps the task closure tiny
        from pyspark import TaskContext  # noqa: PLC0415

        from tesseract_wasm_spark.engine.page import process_page  # noqa: PLC0415

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for seq, pdf in enumerate(batches):
            t0 = time.monotonic()
            out = []
            for url, payload, lang in zip(pdf["url"], pdf["html"], pdf["lang"]):
                res = process_page(
                    bytes(payload), with_text=with_text,
                    with_orientation=with_orientation, recognizer=recognizer,
                    variables=variables, lang=lang,
                )
                # layout_boxes duplicate the words' rects on a full OCR run
                # (the reference returns OCR boxes from getBoundingBoxes once
                # recognition ran — src/ocr-engine.ts:236-239), so they are
                # emitted only on the layout-only path; halves result size.
                layout = (
                    []
                    if with_text
                    else [
                        {"left": b[0], "top": b[1], "right": b[2], "bottom": b[3], "flags": b[4]}
                        for b in res.layout_boxes
                    ]
                )
                out.append(
                    {
                        "url": url,
                        "lang": lang,
                        "width": res.width,
                        "height": res.height,
                        "error": res.error,
                        "rotation": res.rotation,
                        "orient_confidence": res.orient_confidence,
                        "skew_degrees": res.skew_degrees,
                        "words": [vars(w) for w in res.words],
                        "layout_boxes": layout,
                        "page_text": res.page_text,
                    }
                )
            elapsed = (time.monotonic() - t0) * 1000.0
            rdf = pd.DataFrame(
                out,
                columns=[
                    "url", "lang", "width", "height", "error", "rotation",
                    "orient_confidence", "skew_degrees", "words", "layout_boxes", "page_text",
                ],
            )
            rdf["partition_id"] = pid
            rdf["batch_seq"] = seq
            rdf["batch_elapsed_ms"] = elapsed
            rdf["batch_pages"] = len(out)
            yield rdf

    return src.mapInPandas(run, schema=RESULT_DDL)


def extract_any(pages: DataFrame, **ocr_kw) -> DataFrame:
    """Unified main-content extraction over a mixed Common-Crawl-style table:
    dispatch per payload — DRF page images go through the OCR engine, HTML
    payloads through the relational boilerplate-strip extractor
    (datapipe/webtext.py). Returns (url, kind, text_out, error); errors stay
    values (a bad payload must not kill a 10^12-row job).

    The dispatch predicate is a binary prefix test, so Catalyst splits the
    scan into two pruned branches; the HTML branch is pure whole-stage-codegen
    expressions (no Python at all), the OCR branch is the one-Exchange +
    mapInPandas plan documented in PLANS.md §1."""
    from tesseract_wasm_spark import drf  # noqa: PLC0415
    from tesseract_wasm_spark.datapipe.pdftext import pdf_text_expr  # noqa: PLC0415
    from tesseract_wasm_spark.datapipe.webtext import main_content_expr  # noqa: PLC0415

    is_drf = F.substring(F.col("html"), 1, len(drf.MAGIC)) == F.lit(drf.MAGIC)
    is_pdf = F.substring(F.col("html"), 1, 5) == F.lit(b"%PDF-")
    ocr_part = ocr_pages(pages.filter(is_drf), **ocr_kw).select(
        "url",
        F.lit("ocr").alias("kind"),
        F.col("page_text").alias("text_out"),
        "error",
    )
    pdf_part = pages.filter(is_pdf).select(
        "url",
        F.lit("pdf").alias("kind"),
        pdf_text_expr(F.col("html").cast("string")).alias("text_out"),
        F.lit(None).cast("string").alias("error"),
    )
    html_part = pages.filter(~is_drf & ~is_pdf).select(
        "url",
        F.lit("html").alias("kind"),
        main_content_expr(F.col("html").cast("string")).alias("text_out"),
        F.lit(None).cast("string").alias("error"),
    )
    return ocr_part.unionByName(pdf_part).unionByName(html_part)


def metrics_df(results: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics rollup (north rule; reference progress
    stream P13). One row per (partition, batch): pages processed, wall ms,
    pages/sec — queryable like any table."""
    return (
        results.groupBy("partition_id", "batch_seq")
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
            F.first("batch_elapsed_ms").alias("elapsed_ms"),
            F.sum(F.length("page_text")).alias("text_bytes"),
        )
        .withColumn(
            "pages_per_sec",
            F.when(F.col("elapsed_ms") > 0, F.col("pages") / (F.col("elapsed_ms") / 1000.0)),
        )
    )
