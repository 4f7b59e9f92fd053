"""Custom stateful streaming operator via applyInPandasWithState.

The brief's training-data pipelines need custom stateful stream operators
(sessionization, per-key accumulation) beyond windowed aggregates. This module
implements event sessionization over the events-table shape
``(event_id, ts, user_id, event_type, value, props)``: events within
``gap`` of each other for the same user form one session; a session row is
emitted when the watermark passes its close.

Batch-mode twin ``sessionize_batch`` computes identical sessions with plain
window functions, so tests can assert streaming == batch on the same input —
the engine-vs-SQL dual-path pattern used throughout this repo.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_DDL = "start long, end long, n int, total double"

DEFAULT_GAP_SECONDS = 30 * 60


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [{
                "user_id": user_id,
                "session_start": pd.Timestamp(start, unit="us"),
                "session_end": pd.Timestamp(end, unit="us"),
                "n_events": n,
                "total_value": total,
            }]
        )
        return

    events = pd.concat(list(batches)).sort_values("ts")
    closed = []
    if state.exists:
        start, end, n, total = state.get
    else:
        start = end = None  # type: ignore[assignment]
        n, total = 0, 0.0
    for ts, value in zip(events["ts"], events["value"]):
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if start is None:
            start, end, n, total = ts_us, ts_us, 1, float(value)
        elif ts_us - end <= gap_seconds * 1_000_000:
            end, n, total = ts_us, n + 1, total + float(value)
        else:
            closed.append((start, end, n, total))
            start, end, n, total = ts_us, ts_us, 1, float(value)
    state.update((start, end, n, total))
    state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)
    if closed:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(s, unit="us"),
                    "session_end": pd.Timestamp(e, unit="us"),
                    "n_events": cn,
                    "total_value": ct,
                }
                for s, e, cn, ct in closed
            ]
        )


def sessionize_stream(events: DataFrame, *, gap_seconds: int = DEFAULT_GAP_SECONDS,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization: one output row per closed session."""

    def fn(key, batches, state):
        yield from _sessionize_group(key, batches, state, gap_seconds)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, *, gap_seconds: int = DEFAULT_GAP_SECONDS) -> DataFrame:
    """Batch twin: identical session boundaries via window functions (the
    DuckDB-oracle-able formulation)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # NTZ-safe epoch seconds (parquet timestamps load as TIMESTAMP_NTZ;
    # session tz is pinned to UTC in session.get_spark)
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    marked = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    sess = (
        events.withColumn("_new", marked)
        .withColumn("_sid", F.sum("_new").over(w))
    )
    return sess.groupBy("user_id", "_sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("int").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), 6).alias("total_value"),
    ).drop("_sid")
