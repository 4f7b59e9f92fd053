"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (the 100 TB view):
  - exact: one hash-partitioned groupBy on a 16-byte digest — the cheapest
    possible shuffle key; no skew (digests are uniform).
  - n-gram Jaccard brute force: O(n^2) within blocks — the *verification*
    kernel and small-scale baseline; never run unblocked at scale.
  - MinHash+LSH: the scale path — signatures via one vectorized pandas UDF
    (numpy universal hashing, one matmul-shaped min-reduce per batch), then
    band buckets as a groupBy key; only same-bucket pairs are candidates, so
    the join is linear in candidate count, not quadratic in corpus size.
  - SimHash: 64-bit signature, near-dups = Hamming <= k found by pigeonhole
    banding (k+1 chunks, at least one chunk equal) — again a bucket join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MERSENNE31 = (1 << 31) - 1  # 31-bit Mersenne prime: (a*x+b) fits uint64


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content, keeper = min
    doc_id, n_dups = group size."""
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    return (
        docs.select("doc_id", F.md5(norm.cast("binary")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def _word_ngrams(col, n: int = 3):
    toks = F.split(F.trim(F.lower(col)), "\\s+")
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def ngram_jaccard_pairs(docs: DataFrame, *, n: int = 3, threshold: float = 0.5,
                        block_col: str | None = None) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for candidate pairs.

    ``block_col`` restricts the quadratic join to within-block pairs (at scale
    the blocks come from LSH buckets — see minhash_candidates; unblocked this
    is the small-scale baseline / verification kernel)."""
    sh = docs.select(
        F.col("doc_id"), _word_ngrams(F.col("text"), n).alias("shingles"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect("a.shingles", "b.shingles"))
    union = F.size(F.array_union("a.shingles", "b.shingles"))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- MinHash + LSH -----------------------------------------------------------


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE31, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Distinct word-n-gram hashes, reduced mod the 31-bit prime so the
    universal-hash product a*x stays inside uint64."""
    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    import hashlib  # noqa: PLC0415

    h = np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
         for g in grams),
        dtype=np.uint64, count=len(grams),
    )
    return h % np.uint64(MERSENNE31)


def minhash_signatures(docs: DataFrame, *, num_perm: int = 64, ngram: int = 3,
                       seed: int = 1) -> DataFrame:
    """doc_id -> minhash signature (array<long>), one vectorized pandas pass.
    The permutation min-reduce is a [num_shingles, num_perm] uint64 broadcast
    per document — all arithmetic in C (31-bit values, no overflow)."""
    a_params, b_params = _minhash_params(num_perm, seed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = a_params[None, :]
        b = b_params[None, :]
        p = np.uint64(MERSENNE31)
        for pdf in batches:
            sigs = []
            for text in pdf["text"]:
                h = _shingle_hashes(text or "", ngram)
                if h.size == 0:
                    sigs.append([0] * len(a_params))
                    continue
                vals = (h[:, None] * a + b) % p  # [S, P] uint64
                sigs.append(vals.min(axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "signature": sigs})

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, signature array<long>"
    )


def minhash_candidates(signatures: DataFrame, *, bands: int = 16) -> DataFrame:
    """LSH banding: split signatures into ``bands`` rows of width P/bands,
    bucket-join on (band_id, band hash). Returns candidate (doc_a, doc_b)
    pairs with the estimated jaccard from full-signature agreement."""
    banded = signatures.select(
        "doc_id",
        "signature",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.hash(
                    F.slice(
                        "signature",
                        i * (F.size("signature") / bands).cast("int") + 1,
                        (F.size("signature") / bands).cast("int"),
                    )
                ),
            )
        ).alias("band_id", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
            )
        ).cast("double")
        / F.size("sig_a"),
        6,
    )
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


def minhash_near_duplicates(docs: DataFrame, *, num_perm: int = 64, bands: int = 16,
                            ngram: int = 3, threshold: float = 0.5) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidates ->
    exact-jaccard verification on the candidates only."""
    sigs = minhash_signatures(docs, num_perm=num_perm, ngram=ngram)
    cands = minhash_candidates(sigs, bands=bands).select("doc_a", "doc_b")
    sh = docs.select("doc_id", _word_ngrams(F.col("text"), ngram).alias("shingles"))
    verified = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


# --- SimHash -----------------------------------------------------------------


def simhash_signatures(docs: DataFrame, *, seed: int = 2) -> DataFrame:
    """64-bit SimHash over word tokens, vectorized: per batch, token hashes
    unpack to sign matrix [T, 64] and column-sum decides each bit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            out = []
            for text in pdf["text"]:
                toks = (text or "").lower().split()
                if not toks:
                    out.append(0)
                    continue
                hs = np.array(
                    [
                        int.from_bytes(
                            hashlib.blake2b(t.encode(), digest_size=8, person=b"simhash_").digest(),
                            "big",
                        )
                        for t in toks
                    ],
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sig = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)  # store as signed long
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", "text").mapInPandas(run, schema="doc_id long, simhash long")


def simhash_near_duplicates(docs: DataFrame, *, max_hamming: int = 3) -> DataFrame:
    """Pigeonhole banding: split 64 bits into max_hamming+1 chunks; any pair
    within Hamming distance k must agree on >= 1 chunk -> bucket join on
    (chunk_id, chunk value), verify exact Hamming with bit ops."""
    chunks = max_hamming + 1
    width = 64 // chunks
    sigs = simhash_signatures(docs)
    chunk_exprs = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND((1 << width) - 1)
            for i in range(chunks)
        ]
    )
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(chunk_exprs).alias("chunk_id", "chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
