"""Review / approval workflow — the reference's human-in-the-loop surface
(SURVEY.md §3.2) rebuilt without in-place UPDATEs.

Reference semantics:
- J5 approve: UPDATE matches SET user_approved=1 WHERE … IN (SELECT …)
  clearing other candidates of the same entity (database.py:463-481)
- P7 review filter by min confidence (review.html:1306-1335)
- A5/A6 status aggregates (api.py:113-196)
- S13 paginated review read: results ordered, per-result matches ordered by
  score desc, per-entity highest score (database.py:393-461)

Spark-native restatement: approvals are an append-only ``labels`` table
(entity_key, auth_id, user_approved, label_ts) joined at read time — the
latest label per (entity_key, auth_id) wins; nothing is mutated in place,
so the scoring stage table stays immutable and resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LABELS_SCHEMA = (
    "entity_key string, auth_id string, user_approved boolean, label_seq long"
)


def latest_labels(labels: DataFrame) -> DataFrame:
    """Latest label per (entity_key, auth_id) — row_number over an explicit
    ordering (label_seq desc), never dropDuplicates."""
    w = Window.partitionBy("entity_key", "auth_id").orderBy(F.desc("label_seq"))
    return (
        labels.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_labels(
    dict_scores: DataFrame,
    labels: DataFrame,
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """J5: attach user_approved to scored candidates. Approving one
    candidate implicitly un-approves the entity's others (the reference
    clears them with a second UPDATE, database.py:470-478) — expressed here
    as: approved=true only for the labeled pair, false for siblings of an
    approved entity, null (unreviewed) elsewhere.

    The approved-entities attach join's broadcast hint is SIZE-GATED
    (round-4 verdict item 3: the labels table is append-only and grows
    monotonically for the job's life — human-scale in practice, unbounded
    by contract). The gate is a bounded ``limit(max+1).count()`` probe of
    the RAW labels frame (a sound upper bound on approved entities that
    needs no window/shuffle; the scan stops at the gate). Over the gate,
    no hint — AQE still broadcasts when runtime stats allow."""
    lab = latest_labels(labels).select(
        F.col("entity_key").alias("left_key"),
        F.col("auth_id").alias("right_key"),
        "user_approved",
    )
    scored = dict_scores.join(lab, ["left_key", "right_key"], "left")
    approved_entities = lab.filter(F.col("user_approved")).select(
        F.col("left_key"), F.lit(True).alias("_entity_has_approval")
    ).distinct()
    if labels.limit(broadcast_max_rows + 1).count() <= broadcast_max_rows:
        approved_entities = F.broadcast(approved_entities)
    return (
        scored.join(approved_entities, "left_key", "left")
        .withColumn(
            "user_approved",
            F.when(F.col("user_approved").isNotNull(), F.col("user_approved"))
            .when(F.col("_entity_has_approval"), F.lit(False))
            .otherwise(F.lit(None).cast("boolean")),
        )
        .drop("_entity_has_approval")
    )


def review_page(
    dict_scores: DataFrame,
    page: int = 1,
    per_page: int = 50,
    min_confidence: float = 0.0,
    top_k_matches: int = 10,
) -> DataFrame:
    """S13 + P7 + A7 + W4: one join-free pass over the scoring table —
    entities ranked by key, their top-k candidates nested, per-entity
    highest score, filtered by the review confidence threshold.

    The reference does this as a paginated SELECT plus one sub-SELECT per
    row (database.py:417-426); here the nested matches come from a single
    window + collect_list."""
    wk = Window.partitionBy("left_key").orderBy(F.desc("score"), F.asc("right_key"))
    ranked = dict_scores.withColumn("_rn", F.row_number().over(wk)).filter(
        F.col("_rn") <= top_k_matches
    )
    per_entity = ranked.groupBy("left_key").agg(
        F.max("score").alias("highest_confidence"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_rn").alias("rank"),
                    F.col("right_key").alias("match_id"),
                    F.col("score").alias("match_score"),
                    F.col("confidence"),
                )
            )
        ).alias("matches"),
    )
    filtered = per_entity.filter(F.col("highest_confidence") >= min_confidence)
    return (
        filtered.orderBy("left_key")
        .offset((page - 1) * per_page)
        .limit(per_page)
    )


def job_status(dict_scores: DataFrame, success_threshold: float = 0.5) -> DataFrame:
    """A6/A8: the status endpoint's corrected counters (api.py:145-189) as
    one aggregate — total entities, successfully matched (any candidate
    above threshold), match rate."""
    per_entity = dict_scores.groupBy("left_key").agg(
        F.max("score").alias("best_score")
    )
    return per_entity.agg(
        F.count("*").alias("total_entities"),
        F.sum(F.when(F.col("best_score") > success_threshold, 1).otherwise(0)).alias(
            "successful_matches"
        ),
    ).withColumn(
        "match_rate",
        F.col("successful_matches") / F.greatest(F.col("total_entities"), F.lit(1)),
    )
