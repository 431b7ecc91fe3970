"""Materialization boundary shared by the iterative/fan-out operators.

Why a boundary at all: without one, Catalyst's CollapseProject inlines
expensive key expressions into every downstream reference (the 64-bit
simhash was being recomputed ~10× per doc), and an iterative plan
(connected components) grows exponentially.

Two modes — size is safe in both (the materialized frames are small keyed
projections or edge lists); the trade is fault tolerance:

- ``reliable=False``: eager ``localCheckpoint`` — computed exactly once,
  lineage truncated, but blocks live on executor-local storage,
  unreplicated: on a real cluster, losing an executor mid-job makes the
  truncated-lineage RDD unrecoverable and fails the job. Right for
  single-JVM / short-job runs (this sandbox).
- ``reliable=True``: eager ``checkpoint`` to the configured reliable
  (HDFS/object-store) checkpoint dir — survives executor loss at the cost
  of one distributed write per boundary.

``reliable=None`` auto-selects: reliable iff the SparkContext has a
checkpoint dir configured (i.e. a cluster run that set one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    if reliable is None:
        reliable = df.sparkSession.sparkContext.getCheckpointDir() is not None
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
