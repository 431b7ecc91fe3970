"""Structured Streaming rollup over the events table.

The reference is batch-only (SURVEY.md §2.9: progress state, no streams);
this module exists because a transcripts/events pipeline at production
scale ingests continuously. Same aggregation logic as the batch rollup —
readStream → watermark → windowed agg → writeStream — so batch and
streaming stay semantically aligned (the batch twin is oracle-checked in
__spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)


def windowed_rollup(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data handling.
    Works on both batch and streaming DataFrames (watermark is a no-op in
    batch) — the alignment contract with the batch oracle query."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events_rollup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
) -> "StreamingQuery":  # noqa: F821
    """File-source streaming job: parquet drop-dir → windowed rollup →
    parquet sink with checkpointing (exactly-once file sink).

    On a cluster the source would be Kafka/Kinesis; the file source keeps
    the identical plan shape testable here.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    rolled = windowed_rollup(stream)
    return (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
) -> "StreamingQuery":  # noqa: F821
    """Streaming exact-dedup: dropDuplicatesWithinWatermark on the event key
    — the streaming twin of operators/dedup.exact_dedup. State for a key is
    held only within the watermark horizon, so state size is bounded by the
    event rate × watermark window (the property that makes this viable at
    10^12 events; an unbounded dropDuplicates would OOM the state store)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (batch twin of a streaming
    session-window): session starts where the gap from the previous event
    exceeds the threshold; session_id = cumulative count of starts.
    Pure window functions — SQL-oracle-checkable."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps arrive as TIMESTAMP_NTZ in Spark 4 — cast via
    # session-TZ timestamp (UTC) before epoch seconds
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_start = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn("session_seq", F.sum(is_start).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.concat_ws("_", F.col("user_id"), F.col("session_seq")).alias("session_id"),
    )
