"""Contract tests for the Iceberg branch of the table writer (scale.py).

No Iceberg runtime jar ships in this sandbox, so the ACID-append branch
cannot execute for real; these tests pin the CONTRACT instead: catalog
autodetection routes appends through DataFrame.writeTo(...).append() (the
Iceberg v2 API) and never through the parquet path, and the explicit
``fmt`` override works both ways. The parquet branch's resume semantics are
exercised end-to-end in test_spark_pipeline/test_webtext; on a real cluster
the same layout lands in an Iceberg table with ACID appends."""

from __future__ import annotations

from tesseract_wasm_spark import scale


class _Writer:
    def __init__(self, calls):
        self._calls = calls

    def append(self):
        self._calls.append("append")


class _FakeDF:
    """Quacks like a DataFrame for write_table: sparkSession + writeTo/write."""

    def __init__(self, spark, calls):
        self.sparkSession = spark
        self._calls = calls

    def writeTo(self, path):
        self._calls.append(("writeTo", path))
        return _Writer(self._calls)

    @property
    def write(self):
        raise AssertionError("parquet branch must not be taken for Iceberg")


def test_write_table_autodetects_iceberg_catalog(spark):
    calls: list = []
    spark.conf.set(
        "spark.sql.catalog.spark_catalog",
        "org.apache.iceberg.spark.SparkSessionCatalog",
    )
    try:
        scale.write_table(_FakeDF(spark, calls), "crawl.db.results")
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")
    assert calls == [("writeTo", "crawl.db.results"), "append"]


def test_write_table_explicit_fmt_override(spark):
    # fmt="iceberg" takes the writeTo path with NO catalog conf at all
    calls: list = []
    scale.write_table(_FakeDF(spark, calls), "crawl.db.results", fmt="iceberg")
    assert calls == [("writeTo", "crawl.db.results"), "append"]


def test_write_table_defaults_to_parquet(spark, tmp_path):
    # without a catalog, a real DataFrame append lands as parquet
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    path = str(tmp_path / "t")
    scale.write_table(df, path)
    scale.write_table(df, path)  # append mode: second write adds rows
    assert spark.read.parquet(path).count() == 2
