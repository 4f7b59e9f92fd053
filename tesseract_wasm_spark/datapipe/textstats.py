"""Text analysis operators over the documents table.

All pure built-in expressions (JVM-side, whole-stage codegen) — zero Python in
the hot path, so they scan-scale linearly: at 100 TB these are single-pass map
operators with full predicate/column pushdown into the parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker stopwords per language for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in|that|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour)\b",
    "es": r"\b(el|la|los|las|es|una|del|por|para)\b",
}

EN_STOPWORDS_RE = LANG_MARKERS["en"]
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"  # BPE-ish pre-tokenizer classes
WS_RE = "\\s+"


def _count_matches(col, pattern: str):
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    txt = F.col("text")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(txt), WS_RE)).alias("ws_tokens"),
        _count_matches(txt, TOKEN_RE).alias("bpe_tokens"),
        F.length(txt).alias("n_chars_computed"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-stopword language heuristic: count per-language marker hits,
    argmax with deterministic tie-break by language code."""
    txt = F.lower(F.col("text"))
    scores = [
        _count_matches(txt, pat).alias(f"score_{lang}") for lang, pat in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = list(LANG_MARKERS)
    # argmax via greatest + chained CASE (ties -> alphabetically first lang)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(sorted(langs)):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return scored.withColumn("pred_lang", pred)


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document-quality features + composite score (length, token
    shape, punctuation density, stopword ratio)."""
    txt = F.col("text")
    n_chars = F.length(txt)
    ws_tokens = F.size(F.split(F.trim(txt), WS_RE))
    punct = _count_matches(txt, "[^A-Za-z0-9\\s]")
    stop = _count_matches(F.lower(txt), EN_STOPWORDS_RE)
    mean_tok_len = F.round(n_chars.cast("double") / F.greatest(ws_tokens, F.lit(1)), 6)
    punct_ratio = F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop.cast("double") / F.greatest(ws_tokens, F.lit(1)), 6)
    score = F.round(
        F.least(F.lit(1.0), ws_tokens.cast("double") / 64.0) * 0.4
        + F.least(F.lit(1.0), stop_ratio * 4.0) * 0.3
        + (1.0 - F.least(F.lit(1.0), punct_ratio * 10.0)) * 0.3,
        6,
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_computed"),
        ws_tokens.alias("ws_tokens"),
        mean_tok_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


ROLL_BASE = 257
ROLL_PRIME = (1 << 31) - 1


def rolling_fingerprints(docs: DataFrame, *, window: int | None = None) -> DataFrame:
    """Rabin-Karp polynomial rolling-hash fingerprints over normalized text.

    Vectorized per Arrow batch: the hash h = sum(c_i * B^(n-1-i)) mod p is one
    uint64 dot product against precomputed powers (31-bit prime keeps products
    in range). With ``window`` set, emits the minimum window-hash (winnowing
    style, one representative per document) — the content-defined fingerprint
    used for shift-robust near-dup blocking at scale; without it, the whole
    document's hash (equivalent to exact dedup, but O(1) to combine
    incrementally as documents append)."""
    import numpy as np  # noqa: PLC0415
    from collections.abc import Iterator  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    import re  # noqa: PLC0415

    p = np.uint64(ROLL_PRIME)
    b = np.uint64(ROLL_BASE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pow_cache = np.ones(1, dtype=np.uint64)

        def powers(n: int) -> np.ndarray:
            nonlocal pow_cache
            while len(pow_cache) < n:
                nxt = (pow_cache[-1] * b) % p
                pow_cache = np.concatenate([pow_cache, [nxt]])
            return pow_cache[:n]

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                norm = re.sub(r"\s+", " ", (text or "").lower()).encode()
                c = np.frombuffer(norm, dtype=np.uint8).astype(np.uint64)
                n = len(c)
                if n == 0:
                    out.append({"doc_id": doc_id, "rolling_fp": 0})
                    continue
                if window is None or n <= window:
                    pw = powers(n)[::-1]
                    h = int((c * pw % p).sum() % p)
                else:
                    # rolling update: h_{i+1} = (h_i - c_i*B^{w-1})*B + c_{i+w}
                    pw = powers(window)[::-1]
                    h0 = (c[:window] * pw % p).sum() % p
                    top = np.uint64(int(pow_cache[window - 1]))
                    hs = np.empty(n - window + 1, dtype=np.uint64)
                    hs[0] = h0
                    hcur = np.uint64(h0)
                    for i in range(n - window):
                        hcur = ((hcur + p * b - c[i] * top % p) % p * b + c[i + window]) % p
                        hs[i + 1] = hcur
                    h = int(hs.min())
                out.append({"doc_id": doc_id, "rolling_fp": h})
            yield pd.DataFrame(out, columns=["doc_id", "rolling_fp"])

    return docs.select("doc_id", "text").mapInPandas(run, "doc_id long, rolling_fp long")


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the exact-dedup key; a content-defined rolling-hash variant lives in
    dedup.simhash_signatures for the near-dup path)."""
    norm = F.regexp_replace(F.lower(F.col("text")), WS_RE, " ")
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fingerprint"),
    )
