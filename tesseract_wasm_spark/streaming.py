"""Structured Streaming variant of the extraction pipeline.

The reference's async OCRClient processes pages as they arrive and reports
progress out-of-band (src/ocr-client.ts:53-263). The Spark-native analog is a
file/Iceberg stream: ``readStream`` over the pages table -> the same
``mapInPandas`` extraction (stateless per page, so it composes with streaming
with no watermark needed) -> ``writeStream`` with exactly-once checkpointing.

The streaming checkpoint gives the north rule's resume semantics for free in
the continuous-ingest deployment: a restarted query reprocesses only
uncommitted source files, and every micro-batch appends per-partition metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from tesseract_wasm_spark.fixtures import PAGES_DDL
from tesseract_wasm_spark.pipeline import ocr_pages


def read_pages_stream(spark: SparkSession, input_path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def ocr_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    available_now: bool = True,
    with_text: bool = True,
) -> StreamingQuery:
    """Continuous extraction: new page files -> OCR results parquet.

    ``available_now=True`` drains everything currently available then stops —
    the batch-with-checkpoint shape used in tests and backfills; leave False
    for a long-running ingest query.

    Note: no shuffle-rebalance inside the stream (rebalance=False) — file
    sources already split by file, and streaming repartition would force a
    stateful shuffle per micro-batch.
    """
    pages = read_pages_stream(spark, input_path)
    results = ocr_pages(pages, with_text=with_text, rebalance=False)
    writer = (
        results.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extract_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous MIXED-payload extraction: new page files -> (url, kind,
    text_out, error) parquet, dispatching DRF/PDF/HTML exactly like the batch
    pipeline.extract_any (the union of pruned branches composes with
    Structured Streaming because every branch is stateless per row)."""
    from tesseract_wasm_spark.pipeline import extract_any  # noqa: PLC0415

    pages = read_pages_stream(spark, input_path)
    results = extract_any(pages, rebalance=False)
    writer = (
        results.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact deduplication: new page files -> one surviving row per
    payload content within the watermark horizon. The state key is
    md5(payload) — 16 bytes per distinct document — and
    ``dropDuplicatesWithinWatermark`` expires state once the event-time
    watermark passes, so state stays bounded on an unbounded crawl (the
    classic recrawl/mirror-burst dedup shape: duplicates arrive close
    together in event time; cross-horizon dedup belongs to the batch
    pipeline, dedup.exact_duplicates)."""
    pages = read_pages_stream(spark, input_path)
    from pyspark.sql import functions as F  # noqa: PLC0415

    keyed = (
        pages.withColumn("content_md5", F.md5(F.col("html")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )
    writer = (
        keyed.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ingest_metrics_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Windowed ingest-rate metrics with late-data handling: pages per
    (warc_ts window, lang), watermarked so stragglers up to ``watermark`` late
    still count and state is bounded — the Structured Streaming shape for the
    north rule's continuous metrics table (watermark + windowed aggregation;
    the reference's progress stream P13 generalized to event time)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    pages = read_pages_stream(spark, input_path)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.length("html")).alias("payload_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "pages",
            "payload_bytes",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")  # append mode: windows emit once the watermark passes
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
