"""Scale semantics: checkpoint-resume, lineage, and the batch job entry.

North-rule requirements (BASELINE.json): explicit skew handling (see
pipeline.rebalance_pages), per-partition lineage + metrics tables, and
checkpoint-based resume so any partition can be replayed idempotently.

Resume model (SURVEY.md §4 O11): the results table is keyed by url; a run
anti-joins the input against already-written urls and processes only the
remainder. Replaying a partition is therefore idempotent — its urls are
already present and anti-joined away. With an Iceberg catalog the appends are
ACID; on plain parquet (this sandbox) the same layout applies with
last-writer-wins semantics per run_id.
"""

from __future__ import annotations

import uuid

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from tesseract_wasm_spark.pipeline import extract_any, metrics_df, ocr_pages


#: url-hash bucket fan-out for the results table layout. Every result row
#: carries url_bucket = pmod(xxhash64(url), URL_BUCKETS) and plain-parquet
#: writes partition by it, so at 10^12 rows (a) the resume anti-join keys on
#: (url_bucket, url) — with an Iceberg bucket-partitioned table the join
#: becomes a storage-partitioned join and the completed side is never
#: shuffled; (b) any single bucket is independently replayable/compactable.
URL_BUCKETS = 256


def url_bucket_col():
    return F.pmod(F.xxhash64("url"), F.lit(URL_BUCKETS)).cast("int")


def iceberg_results_ddl(table: str, df: DataFrame, *,
                        bucket_on: str = "url") -> str:
    """The CREATE TABLE statement an Iceberg deployment runs ONCE before the
    first append — the partition-spec twin of the parquet layout: parquet
    partitions by the materialized ``url_bucket`` column (pmod(xxhash64)),
    Iceberg declares ``bucket(URL_BUCKETS, url)`` natively so the catalog
    owns the transform (Iceberg buckets with murmur3 rather than xxhash64 —
    the VALUES differ but the contract is the same: a fixed URL_BUCKETS-way
    url-hash fan-out, storage-partitioned resume joins, per-bucket replay/
    compaction). The ``url_bucket`` column itself is parquet-layout-only and
    excluded from the Iceberg schema."""
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != "url_bucket"
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING iceberg "
        f"PARTITIONED BY (bucket({URL_BUCKETS}, {bucket_on}))"
    )


def ensure_iceberg_table(spark: SparkSession, table: str, df: DataFrame, *,
                         bucket_on: str = "url") -> str:
    """Create the bucket-partitioned Iceberg results table if absent and
    return the DDL used (contract-tested; executes only under a real Iceberg
    catalog)."""
    ddl = iceberg_results_ddl(table, df, bucket_on=bucket_on)
    spark.sql(ddl)
    return ddl


def write_table(df: DataFrame, path: str, *, fmt: str | None = None,
                partition_by: tuple[str, ...] = ()) -> None:
    """Iceberg-compatible writer abstraction (SURVEY.md §7): appends go to an
    Iceberg table when a catalog is configured (ACID appends — the real
    100 TB deployment), else to plain parquet with the same layout. ``fmt``
    overrides autodetection ("iceberg" | "parquet"). ``partition_by`` maps to
    hive-style directory partitioning on parquet; an Iceberg deployment
    declares the same columns in its partition spec at table creation, so
    the append itself needs no per-write clause."""
    spark = df.sparkSession
    if fmt is None:
        has_iceberg = any(
            "iceberg" in spark.conf.get(k, "").lower()
            for k in ("spark.sql.catalog.spark_catalog", "spark.sql.extensions")
        )
        fmt = "iceberg" if has_iceberg else "parquet"
    if fmt == "iceberg":
        if "url_bucket" in partition_by and "url_bucket" in df.columns:
            # the Iceberg spec (bucket(URL_BUCKETS, url), see
            # iceberg_results_ddl) owns the fan-out; the materialized column
            # exists only for the parquet directory layout
            df = df.drop("url_bucket")
        df.writeTo(path).append()
    else:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)


def completed_urls(spark: SparkSession, results_path: str, mode: str = "full") -> DataFrame | None:
    """Urls already extracted *in the same mode* — a layout-only run must not
    mark urls complete for full extraction (and vice versa).

    Only a genuinely-absent results table means "first run": any OTHER read
    failure (permissions blip, corrupt footer, eventual consistency) is
    re-raised — silently treating it as first-run would disable resume and
    re-append duplicates for the whole input, which at 10^12 rows is a very
    expensive way to learn the directory was briefly unlistable."""
    try:
        df = spark.read.parquet(results_path)
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None  # first run: nothing written yet
        raise
    if "mode" in df.columns:
        df = df.filter(F.col("mode") == mode)
    cols = ["url_bucket", "url"] if "url_bucket" in df.columns else ["url"]
    return df.select(*cols)


def run_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    with_text: bool = True,
    recognizer: str = "template",
    num_partitions: int | None = None,
    model_blob: bytes | None = None,
) -> dict:
    """Process all pages not yet present in ``{out_dir}/results``; append
    results + per-partition metrics. Returns a small run summary dict.
    ``model_blob``: optional TWSM2 trained-weight blob shipped to workers
    (see pipeline.ocr_pages)."""
    results_path = f"{out_dir}/results"
    metrics_path = f"{out_dir}/metrics"
    run_id = uuid.uuid4().hex
    mode = "full" if with_text else "layout"

    done = completed_urls(spark, results_path, mode)
    # a pre-bucketing results table keeps its legacy flat layout: appending
    # partitioned files into an unpartitioned directory corrupts the table
    legacy = done is not None and "url_bucket" not in done.columns
    if done is None:
        todo = pages
    elif not legacy:
        # anti-join on (url_bucket, url): with a bucket-partitioned results
        # table both sides arrive bucket-aligned (storage-partitioned join on
        # Iceberg; partition-pruned scan on parquet)
        todo = (
            pages.withColumn("url_bucket", url_bucket_col())
            .join(done, ["url_bucket", "url"], "left_anti")
            .drop("url_bucket")
        )
    else:  # pre-bucketing layout (older results tables)
        todo = pages.join(done, "url", "left_anti")

    res = ocr_pages(todo, with_text=with_text, recognizer=recognizer,
                    model_blob=model_blob,
                    num_partitions=num_partitions).persist()
    n = res.count()
    if n == 0:
        res.unpersist()
        return {"run_id": run_id, "pages": 0, "resumed": done is not None}

    out = res.withColumn("run_id", F.lit(run_id)).withColumn("mode", F.lit(mode))
    if legacy:
        write_table(out, results_path)
    else:
        write_table(out.withColumn("url_bucket", url_bucket_col()),
                    results_path, partition_by=("url_bucket",))
    write_table(metrics_df(res).withColumn("run_id", F.lit(run_id)), metrics_path)
    errors = res.filter(F.col("error").isNotNull()).count()
    res.unpersist()
    return {"run_id": run_id, "pages": n, "errors": errors, "resumed": done is not None}


def run_extract_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    recognizer: str = "template",
    num_partitions: int | None = None,
    model_blob: bytes | None = None,
) -> dict:
    """The MIXED-payload main-content pipeline (pipeline.extract_any: DRF ->
    OCR, PDF -> pdftext, HTML -> webtext) under the same checkpoint-resume
    contract: results keyed by url at ``{out_dir}/extracted``, anti-join on
    completed urls, idempotent partition replay. Per-kind counts land in the
    summary; per-partition lineage for the heavy OCR branch stays available
    via the run_with_resume path (the HTML/PDF branches are pure expressions
    with no Python stage to instrument)."""
    path = f"{out_dir}/extracted"
    run_id = uuid.uuid4().hex
    done = completed_urls(spark, path, mode="extract")
    legacy = done is not None and "url_bucket" not in done.columns
    if done is None:
        todo = pages
    elif not legacy:
        todo = (
            pages.withColumn("url_bucket", url_bucket_col())
            .join(done, ["url_bucket", "url"], "left_anti")
            .drop("url_bucket")
        )
    else:
        todo = pages.join(done, "url", "left_anti")

    res = extract_any(todo, recognizer=recognizer,
                      num_partitions=num_partitions,
                      model_blob=model_blob).persist()
    n = res.count()
    if n == 0:
        res.unpersist()
        return {"run_id": run_id, "pages": 0, "resumed": done is not None}
    out = res.withColumn("run_id", F.lit(run_id)).withColumn("mode", F.lit("extract"))
    if legacy:
        write_table(out, path)
    else:
        write_table(out.withColumn("url_bucket", url_bucket_col()),
                    path, partition_by=("url_bucket",))
    kinds = {r["kind"]: r["n"] for r in res.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    errors = res.filter(F.col("error").isNotNull()).count()
    res.unpersist()
    return {"run_id": run_id, "pages": n, "errors": errors, "kinds": kinds,
            "resumed": done is not None}
