"""End-to-end reconciliation pipeline with checkpointed, resumable stages.

Replaces the reference's job state machine (ST2, api.py:214-287: uploaded →
queued → processing → … → completed, restart from paused/failed) with the
Spark-native contract: each stage writes a parquet/Iceberg table; a stage
whose output exists (parquet _SUCCESS marker) is skipped on re-run; "resume"
= rerun the job — completed stages read back instantly, the failed stage
recomputes idempotently (every stage is a deterministic function of the
previous stage's table). Stuck-job recovery (ST3, reset_stuck_jobs.py:17-40)
becomes a no-op by design.

Stages:
    entities   extract + normalize + key          (stage_entities)
    blocking   multi-pass candidate pairs          (stage_blocking)
    scoring    batteries + composite + bands       (stage_scoring)
    clusters   CC over matched entity-entity pairs (stage_clusters)
    best       rank-1 dictionary match per entity  (stage_best_match)
    metrics    per-stage counters/lineage          (job_metrics, append-only)

The metrics table is the immutable-log replacement for the reference's
in-place jobs.progress UPDATEs (database.py:200-223).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking as B
from ..operators import clustering as C
from ..operators import extract as E
from ..operators import ranking as R
from ..operators import scoring as S
from ..sources import writers as W


@dataclass
class ReconConfig:
    job_id: str
    work_dir: str
    match_threshold: float = S.DEFAULT_MATCH_THRESHOLD
    success_threshold: float = 0.5  # reference P6 "successful match" (api.py:150)
    top_k: int = 10  # reference max_results (reconciliation_engine.py:394)
    max_block_size: int = 1000
    force: bool = False  # recompute even if stage outputs exist


class ReconPipeline:
    def __init__(self, spark: SparkSession, cfg: ReconConfig):
        self.spark = spark
        self.cfg = cfg
        self._metrics_rows: list[tuple[str, str, str, float]] = []

    # -- stage plumbing ------------------------------------------------------

    def _path(self, stage: str) -> str:
        return os.path.join(self.cfg.work_dir, self.cfg.job_id, f"stage_{stage}")

    def _run_stage(self, stage: str, compute, partition_by=None) -> DataFrame:
        path = self._path(stage)
        if not self.cfg.force and W.stage_exists(self.spark, path):
            return W.read_stage(self.spark, path)
        df = compute()
        W.write_stage(df, path, partition_by)
        out = W.read_stage(self.spark, path)
        self._metric(stage, "rows", float(out.count()))
        return out

    def _metric(self, stage: str, metric: str, value: float) -> None:
        self._metrics_rows.append((self.cfg.job_id, stage, metric, value))

    def flush_metrics(self) -> None:
        if not self._metrics_rows:
            return
        df = self.spark.createDataFrame(
            self._metrics_rows, "job_id string, stage string, metric string, value double"
        )
        df.write.mode("append").parquet(os.path.join(self.cfg.work_dir, "job_metrics"))
        self._metrics_rows = []

    # -- stages --------------------------------------------------------------

    def entities(self, transcripts: DataFrame) -> DataFrame:
        return self._run_stage("entities", lambda: E.extract_entities(transcripts))

    def blocking(self, entities: DataFrame, dictionary: DataFrame) -> tuple[DataFrame, DataFrame]:
        distinct = E.distinct_entities(entities)
        ekeyed = B.add_block_keys(distinct)
        dkeyed = B.add_block_keys(dictionary, "norm_label")

        def compute_dict():
            return B.dictionary_candidates(ekeyed, dkeyed)

        def compute_self():
            pairs, dropped = B.self_candidates(ekeyed, self.cfg.max_block_size)
            n_dropped = dropped.count()
            self._metric("blocking", "oversized_blocks_dropped", float(n_dropped))
            return pairs

        dict_pairs = self._run_stage("blocking_dict", compute_dict)
        self_pairs = self._run_stage("blocking_self", compute_self)
        return dict_pairs, self_pairs

    def scoring(
        self,
        entities: DataFrame,
        dictionary: DataFrame,
        dict_pairs: DataFrame,
        self_pairs: DataFrame,
    ) -> tuple[DataFrame, DataFrame]:
        distinct = E.distinct_entities(entities)

        def compute_dict():
            named = S.attach_names(
                dict_pairs,
                distinct,
                dictionary,
                right_id="auth_id",
                right_name="norm_label",
                right_description="description",
            )
            return S.score_pairs(named, self.cfg.match_threshold)

        def compute_self():
            named = S.attach_names(self_pairs, distinct, distinct)
            return S.score_pairs(named, self.cfg.match_threshold)

        dict_scores = self._run_stage("scoring_dict", compute_dict)
        self_scores = self._run_stage("scoring_self", compute_self)
        return dict_scores, self_scores

    def clusters(self, entities: DataFrame, self_scores: DataFrame) -> DataFrame:
        def compute():
            edges = self_scores.filter(F.col("is_match")).select("left_key", "right_key")
            comps = C.connected_components(edges)
            return C.assign_clusters(E.distinct_entities(entities), comps)

        return self._run_stage("clusters", compute)

    def best_matches(self, entities: DataFrame, dictionary: DataFrame, dict_scores: DataFrame) -> DataFrame:
        def compute():
            distinct = E.distinct_entities(entities)
            best = R.best_match(
                dict_scores.filter(F.col("score") > self.cfg.success_threshold)
            )
            dic = dictionary.select(
                F.col("auth_id").alias("right_key"), F.col("label").alias("match_label")
            )
            return (
                distinct.select("entity_key", "name", "norm_name", "entity_type")
                .join(best, F.col("entity_key") == best["left_key"], "left")
                .join(F.broadcast(dic), "right_key", "left")
                .select(
                    "entity_key",
                    "name",
                    "norm_name",
                    "entity_type",
                    "right_key",
                    "match_label",
                    "score",
                    "confidence",
                )
            )

        return self._run_stage("best", compute)

    # -- full run --------------------------------------------------------------

    def run(self, transcripts: DataFrame, dictionary: DataFrame) -> dict[str, DataFrame]:
        ents = self.entities(transcripts)
        dict_pairs, self_pairs = self.blocking(ents, dictionary)
        dict_scores, self_scores = self.scoring(ents, dictionary, dict_pairs, self_pairs)
        clusters = self.clusters(ents, self_scores)
        best = self.best_matches(ents, dictionary, dict_scores)
        # A4–A8 analogues: one aggregate per stage → metrics table
        n_matched = best.filter(F.col("right_key").isNotNull()).count()
        n_total = best.count()
        self._metric("best", "successful_matches", float(n_matched))
        self._metric("best", "match_rate", n_matched / max(n_total, 1))
        self.flush_metrics()
        return {
            "entities": ents,
            "dict_pairs": dict_pairs,
            "self_pairs": self_pairs,
            "dict_scores": dict_scores,
            "self_scores": self_scores,
            "clusters": clusters,
            "best": best,
        }
