"""Ranking / best-match / top-k (SURVEY.md §2.5 W1–W4).

Reference semantics: sort candidates per entity by score desc, best = rank
1, keep top-k (reconciliation_engine.py:407-415; SQL ORDER BY match_score
DESC at database.py:420-424). One window, deterministic tie-break on
right_key — never relies on input order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_candidates(scores: DataFrame, id_col: str = "left_key") -> DataFrame:
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("right_key"))
    return scores.withColumn("rank", F.row_number().over(w))


def top_k(scores: DataFrame, k: int = 10, id_col: str = "left_key") -> DataFrame:
    """W3: keep top-k candidates per entity (reference max_results=10)."""
    return rank_candidates(scores, id_col).filter(F.col("rank") <= k)


def best_match(scores: DataFrame, id_col: str = "left_key") -> DataFrame:
    """W2: rank-1 candidate per entity, with is_best_match flag parity
    (database.py:370)."""
    return (
        rank_candidates(scores, id_col)
        .filter(F.col("rank") == 1)
        .withColumn("is_best_match", F.lit(True))
        .drop("rank")
    )


def paginate(df: DataFrame, order_cols: list[str], page: int, per_page: int) -> DataFrame:
    """W4: stable pagination — ORDER BY + OFFSET/LIMIT (database.py:404-412)."""
    return df.orderBy(*order_cols).offset((page - 1) * per_page).limit(per_page)
