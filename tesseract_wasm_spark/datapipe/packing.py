"""Training-sequence packing — the last mile of an LLM data pipeline: after
filtering/dedup, documents are concatenated in a deterministic order and
chunked into fixed-token-budget training sequences (the GPT-style
concat-and-chunk pack). This operator assigns every document its sequence
id and offset WITHOUT materializing the concatenation — pure window
arithmetic over token counts.

Scale shape: the running sum is windowed PER SHARD (``shard_col``,
default the source/domain column), never globally — a global ORDER BY
doc_id would sort the entire corpus in one task (the classic
single-partition window straggler). Real packing jobs shard exactly this
way: sequences never span shards, which also keeps replay/resume at shard
granularity. Within a shard the window is a single sort of (id, n_tokens)
longs — tiny next to the payload bytes that this operator never touches.

Reference: tesseract-wasm has no data-pipeline tier (brief-scope op, not
reference-parity scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tesseract_wasm_spark.datapipe.textstats import WS_RE

#: default training-sequence token budget (a common context-window shard)
TARGET_TOKENS = 2048


def pack_sequences(docs: DataFrame, *, target_tokens: int = TARGET_TOKENS,
                   shard_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """One row per document: its shard, whitespace-token count, the
    training sequence its FIRST token lands in (greedy concat-and-chunk:
    ``seq_id = floor(tokens_before / target)``), and its offset inside
    that sequence. Documents spanning a boundary simply continue into the
    next sequence — exactly what the trainer's chunker does to the
    concatenated stream, so these assignments ARE the pack manifest."""
    toks = F.size(F.split(F.trim(F.col(text_col)), WS_RE))
    w = Window.partitionBy(shard_col).orderBy(id_col)
    cum_before = F.sum(toks).over(w) - toks
    return docs.select(
        shard_col, id_col,
        toks.alias("n_tokens"),
        F.floor(cum_before / target_tokens).alias("seq_id"),
        (cum_before % target_tokens).alias("offset_in_seq"),
    )
