"""Incremental reconciliation — the production shape of a 10^12-turn job.

A full re-run over the entire corpus for every new batch of transcripts is
the one thing a 100 TB pipeline can never afford. This module reconciles a
NEW batch against the existing checkpointed state:

1. extract + normalize the new batch; anti-join against the existing
   distinct-entities table → only genuinely unseen entity keys proceed
   (the md5 key makes "seen" exact);
2. block the new entities against (a) the broadcast dictionary and (b) the
   UNION of old + new entities — new↔old and new↔new pairs only, never
   old↔old (those pairs are already in the scoring table);
3. score only the new pairs (same fused-UDF scorer);
4. append to the stage tables; re-run connected components over old+new
   match edges (CC itself is cheap relative to scoring — edges are the
   sparse output, and the star-contraction rounds converge in O(log d)).

Costs scale with the batch, not the corpus: the only corpus-wide work is
the block-key equi-join of new keys against old keys (shuffle of the
*keys*, not the pairs) and the CC over match edges.

Determinism: appends are keyed by entity_key/pair keys; re-running the same
batch id is idempotent (the batch's stage dirs checkpoint exactly like the
full pipeline's).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking as B
from ..operators import clustering as C
from ..operators import extract as E
from ..operators import scoring as S
from ..sources import writers as W


class IncrementalRecon:
    def __init__(self, spark: SparkSession, work_dir: str, job_id: str,
                 match_threshold: float = S.DEFAULT_MATCH_THRESHOLD,
                 max_block_size: int = 1000):
        self.spark = spark
        self.base = os.path.join(work_dir, job_id)
        self.match_threshold = match_threshold
        self.max_block_size = max_block_size

    def _stage(self, name: str) -> str:
        return os.path.join(self.base, f"stage_{name}")

    def ingest_batch(self, transcripts_batch: DataFrame, dictionary: DataFrame) -> dict:
        """Reconcile one new batch against existing state; returns the new
        rows added per stage plus the refreshed cluster assignment."""
        spark = self.spark
        old_distinct = spark.read.parquet(self._stage("entities_distinct"))
        old_scores = spark.read.parquet(self._stage("scoring"))

        batch_entities = E.extract_entities(transcripts_batch)
        batch_distinct = E.distinct_entities(batch_entities)
        new_distinct = batch_distinct.join(
            old_distinct.select("entity_key"), "entity_key", "left_anti"
        )

        nkeyed = B.add_block_keys(new_distinct)
        dkeyed = B.add_block_keys(dictionary, "norm_label")
        # new ↔ dictionary
        dict_pairs = B.dictionary_candidates(nkeyed, dkeyed).withColumn(
            "pair_kind", F.lit("dict")
        )
        # new ↔ (old ∪ new): union the keyed frames, then keep only pairs
        # touching a new key — old↔old pairs already exist in the scoring
        # table and must not be recomputed
        all_keyed = B.add_block_keys(old_distinct).unionByName(nkeyed)
        self_pairs, _dropped = B.self_candidates(all_keyed, self.max_block_size)
        new_keys = new_distinct.select(F.col("entity_key").alias("k"))
        touching_new = self_pairs.join(
            F.broadcast(new_keys), self_pairs["left_key"] == F.col("k"), "left_semi"
        ).unionByName(
            self_pairs.join(
                F.broadcast(new_keys), self_pairs["right_key"] == F.col("k"), "left_semi"
            )
        ).dropDuplicates(["left_key", "right_key"])
        new_pairs = dict_pairs.unionByName(
            touching_new.withColumn("pair_kind", F.lit("self"))
        )
        new_scores = S.score_pairs(new_pairs, self.match_threshold)

        # append to state (idempotence per batch comes from the caller using
        # one batch-scoped sub-dir per delivery in production; here append)
        new_distinct.write.mode("append").parquet(self._stage("entities_distinct"))
        new_scores.write.mode("append").parquet(self._stage("scoring"))

        # refresh clusters over ALL match edges (old + new)
        all_scores = spark.read.parquet(self._stage("scoring"))
        edges = all_scores.filter(
            (F.col("pair_kind") == "self") & F.col("is_match")
        ).select("left_key", "right_key")
        comps = C.connected_components(edges)
        all_distinct = spark.read.parquet(self._stage("entities_distinct"))
        clusters = C.assign_clusters(all_distinct, comps)
        W.write_stage(clusters, self._stage("clusters"))

        return {
            "new_entities": new_distinct,
            "new_scores": new_scores,
            "clusters": spark.read.parquet(self._stage("clusters")),
        }
