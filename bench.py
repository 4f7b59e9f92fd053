"""Benchmark harness (driver contract: one JSON line on stdout).

Measures:
  - OCR extraction throughput (pages/sec) on a deterministic DRF corpus at two
    parallelism levels — local[N_LOW] and local[N_HIGH] — on the *same* input,
    which is this sandbox's stand-in for the north rule's N vs 4N executor
    scaling requirement (efficiency = (thr_high / thr_low) / (N_high / N_low)).
  - headline relational/datapipe queries at $SPARK_GRAFT_SF_DIR (default
    /root/testdata/sf0.1).

Each parallelism level runs in a subprocess so every measurement gets a fresh
JVM (no cross-contamination of executor pools / JIT state).

Output: {"metric": "ocr_pages_per_sec", "value": <pages/sec at high
parallelism>, "unit": "sec", "queries": {...per-query seconds...}, "sf": ...,
"scaling": {...}}. Also refreshes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_LOW = max(1, CPUS // 4)
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "768"))
CORPUS_PATH = os.environ.get("SPARK_GRAFT_BENCH_CORPUS", "/tmp/twspark_bench_corpus.parquet")

HEADLINE_QUERIES = [
    "q_agg_mean", "q_rollup_line", "q_first_last", "q_concat_ws",
    "dedup_exact", "dedup_minhash", "text_quality", "text_langid", "ann_topk",
]


def _ensure_corpus(cores: int) -> None:
    """Rasterize the bench corpus once (deterministic); reused by both levels."""
    if os.path.exists(CORPUS_PATH):
        return
    from tesseract_wasm_spark.fixtures import corpus_df
    from tesseract_wasm_spark.session import get_spark

    spark = get_spark("bench-corpus", cores=cores)
    corpus_df(spark, N_PAGES, partitions=cores * 2).write.mode("overwrite").parquet(CORPUS_PATH)
    spark.stop()


def _ocr_worker(cores: int) -> dict:
    """Measure OCR throughput at local[cores]; prints one JSON line."""
    from pyspark.sql import functions as F

    from tesseract_wasm_spark.pipeline import ocr_pages
    from tesseract_wasm_spark.session import get_spark

    spark = get_spark(f"bench-ocr-{cores}", cores=cores)
    pages = spark.read.parquet(CORPUS_PATH)
    n = pages.count()
    # warm the executor pool (JVM + Python worker startup out of measurement)
    ocr_pages(pages.limit(cores), num_partitions=cores).count()
    t0 = time.monotonic()
    res = ocr_pages(pages, num_partitions=cores * 2)
    n_ok = res.filter(F.col("error").isNull()).count()
    wall = time.monotonic() - t0
    spark.stop()
    return {"cores": cores, "pages": n, "ok": n_ok, "wall_sec": wall,
            "pages_per_sec": n / wall}


def _queries_worker(cores: int) -> dict:
    from tesseract_wasm_spark.queries import REGISTRY
    from tesseract_wasm_spark.session import get_spark

    spark = get_spark("bench-queries", cores=cores)
    timings: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        fn, _ = REGISTRY[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return timings


def _run_sub(mode: str, cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", mode, str(cores)],
        capture_output=True, text=True, check=False, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker {mode}/{cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def _write_baseline_md(ocr_low: dict, ocr_high: dict, eff: float, queries: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured throughput & scaling",
        "",
        f"Corpus: {ocr_high['pages']} deterministic DRF pages (fixtures.corpus_df, seed 7); "
        f"relational queries at `{SF_DIR}`.",
        "",
        "| config | pages | wall (s) | pages/sec |",
        "|---|---|---|---|",
        f"| local[{ocr_low['cores']}] | {ocr_low['pages']} | {ocr_low['wall_sec']:.2f} | {ocr_low['pages_per_sec']:.1f} |",
        f"| local[{ocr_high['cores']}] | {ocr_high['pages']} | {ocr_high['wall_sec']:.2f} | {ocr_high['pages_per_sec']:.1f} |",
        "",
        f"**Scaling efficiency ({ocr_low['cores']}→{ocr_high['cores']} cores, same input): "
        f"{eff:.3f}** (north-rule target ≥ 0.8)",
        "",
        "| query | seconds |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in queries.items()]
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        mode, cores = sys.argv[2], int(sys.argv[3])
        _ensure_corpus(cores)
        result = _ocr_worker(cores) if mode == "ocr" else _queries_worker(cores)
        print(json.dumps(result))
        return

    _ensure_corpus(CPUS)
    ocr_low = _run_sub("ocr", N_LOW)
    ocr_high = _run_sub("ocr", CPUS)
    eff = (ocr_high["pages_per_sec"] / ocr_low["pages_per_sec"]) / (CPUS / N_LOW)
    queries = _run_sub("queries", CPUS)
    _write_baseline_md(ocr_low, ocr_high, eff, queries)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "ocr_pages_per_sec",
                "value": round(ocr_high["pages_per_sec"], 2),
                "unit": "sec",
                "queries": queries,
                "sf": sf_val,
                "ocr": {
                    f"local[{ocr_low['cores']}]": round(ocr_low["pages_per_sec"], 2),
                    f"local[{ocr_high['cores']}]": round(ocr_high["pages_per_sec"], 2),
                    "pages": ocr_high["pages"],
                },
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
