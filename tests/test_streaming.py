"""Structured Streaming pipeline tests: drain-all correctness + checkpointed
incremental restart (streaming flavor of resume)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tesseract_wasm_spark.fixtures import fixtures_df
from tesseract_wasm_spark.streaming import ocr_stream


def test_stream_available_now_and_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")

    pages = fixtures_df(spark, n_corpus_pages=4)
    first = pages.filter(F.col("url").contains("page-000"))
    n_first = first.count()
    first.write.mode("append").parquet(in_dir)

    q = ocr_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    res1 = spark.read.parquet(out_dir)
    assert res1.count() == n_first

    # byte identity through the streaming path
    truth = {r["url"]: r["text"] for r in first.collect()}
    for r in res1.select("url", "page_text").collect():
        assert r["page_text"] == truth[r["url"]]

    # add the rest; restarted query processes ONLY the new files
    rest = pages.join(first.select("url"), "url", "left_anti")
    rest.write.mode("append").parquet(in_dir)
    q2 = ocr_stream(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    res2 = spark.read.parquet(out_dir)
    assert res2.count() == pages.count()
    assert res2.select("url").distinct().count() == pages.count()
