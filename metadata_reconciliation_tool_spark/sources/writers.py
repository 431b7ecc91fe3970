"""Sinks (SURVEY.md §2.1 S5–S8): stage checkpoint tables + CSV/JSON exports.

The reference persists per-row into SQLite (database.py:339-391) and
exports flattened CSV with a NO_MATCH sentinel (web.py:408-485) and a JSON
envelope (web.py:488-538). Here: parquet stage tables (Iceberg in
production — same writer interface), and the exports as single declarative
writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_stage(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Checkpointed stage output. Overwrite = idempotent re-run; the
    parquet _SUCCESS marker is the resume contract (plans/pipeline.py)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def stage_exists(spark: SparkSession, path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def export_csv_best_matches(best: DataFrame, out_path: str) -> None:
    """S7: flat CSV of best match per entity; entities with no successful
    match get NO_MATCH sentinel values (web.py:461-472)."""
    flat = best.select(
        "entity_key",
        F.col("name").alias("entity_name"),
        "entity_type",
        F.coalesce(F.col("match_label"), F.lit("NO_MATCH")).alias("match_name"),
        F.coalesce(F.col("right_key"), F.lit("NO_MATCH")).alias("match_id"),
        F.coalesce(F.format_number(F.col("score"), 3), F.lit("0.000")).alias("match_score"),
        F.coalesce(F.col("confidence"), F.lit("none")).alias("confidence"),
    )
    flat.coalesce(1).write.mode("overwrite").option("header", True).csv(out_path)


def export_json_results(results: DataFrame, job_id: str, out_path: str) -> None:
    """S8: JSON export with the reference's envelope (job_info + results)."""
    enveloped = results.withColumn(
        "envelope",
        F.to_json(
            F.struct(
                F.lit(job_id).alias("job_id"),
                F.struct(*[F.col(c) for c in results.columns]).alias("result"),
            )
        ),
    ).select("envelope")
    enveloped.coalesce(1).write.mode("overwrite").text(out_path)
