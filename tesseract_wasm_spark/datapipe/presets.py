"""Composed pipeline presets: the standard pre-training cleanup pass
assembled from the repo's operators — and, as importantly, the DECISION
REPORT that says per document which stage dropped it (the observable a
pipeline owner actually tunes against; "we lost 40% of source X to the
repetition rule" is the finding that matters at 100 TB).

Scale shape: every row-local stage (mojibake, Gopher rules, repetition) is
composed at the EXPRESSION level — one whole-stage-codegen projection over
the corpus, no joins between stages — and the only shuffle is the one exact
dedup genuinely needs (groupBy on the 16-byte content digest + join back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tesseract_wasm_spark.datapipe.dedup import text_digest_expr
from tesseract_wasm_spark.datapipe.textstats import (
    gopher_cols,
    mojibake_cols,
    repetition_cols,
)

#: decision order: cheap encoding sanity first, shape rules, repetition,
#: exact dedup last (only survivors of a stage are attributed to later ones)
STAGES = ("mojibake", "gopher", "repetition", "duplicate")


def corpus_filter_report(docs: DataFrame, *, min_words: int = 50,
                         max_bad_frac: float = 0.01) -> DataFrame:
    """Per-document keep/drop decision table for the composed cleanup pass:
    ``reason`` is the FIRST failing stage in the canonical order
    (mojibake -> gopher -> repetition -> exact-duplicate), ``kept`` the
    final verdict. Exact-dup keeper = min doc_id per normalized-content
    digest, computed over the full corpus (duplicates of a doc that already
    failed a filter are still attributed 'duplicate' only if they themselves
    passed every filter — same semantics both engines)."""
    txt = F.col("text")
    staged = docs.select(
        "doc_id",
        mojibake_cols(txt, max_bad_frac=max_bad_frac)["clean"].alias("_clean"),
        gopher_cols(txt, min_words=min_words)["keep"].alias("_gkeep"),
        repetition_cols(txt)["repetitive"].alias("_rep"),
        text_digest_expr(txt).alias("_md5"),
    )
    keepers = staged.groupBy("_md5").agg(F.min("doc_id").alias("_keep_id"))
    reason = (
        F.when(~F.col("_clean"), "mojibake")
        .when(~F.col("_gkeep"), "gopher")
        .when(F.col("_rep"), "repetition")
        .when(F.col("doc_id") != F.col("_keep_id"), "duplicate")
        .otherwise("kept")
    )
    return (
        staged.join(keepers, "_md5")
        .select("doc_id", reason.alias("reason"),
                (reason == "kept").alias("kept"))
    )


def clean_corpus(docs: DataFrame, *, min_words: int = 50,
                 max_bad_frac: float = 0.01) -> DataFrame:
    """The cleanup pass itself: documents surviving every stage of
    corpus_filter_report, original columns intact."""
    report = corpus_filter_report(docs, min_words=min_words,
                                  max_bad_frac=max_bad_frac)
    return docs.join(report.filter("kept").select("doc_id"), "doc_id")
