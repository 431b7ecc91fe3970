"""Multi-pass blocking — the set-oriented rebuild of J3, the heart of the
reference (SURVEY.md §2.3).

The reference retrieves candidates per entity via live HTTP (API pass then
SPARQL fallback, union + dedup across passes —
wikidata_cultural_client.py:324-406, dedup at :382). Here the authority is a
broadcast dictionary and the passes are key-generation projections +
equi-joins:

- pass A  prefix: substring(token_sort(norm_name), 1, 6) — catches case /
          whitespace / punctuation / token-reorder variants exactly.
- pass B  MinHash-LSH bands over 3-char shingles of the token-sorted name
          (32 perms × 8 bands × 4 rows) — catches typos / respellings that
          move the prefix.
- pass C  phonetic: metaphone of the longest token (surname-ish) — catches
          initials + phonetic respellings.

Union of passes ≙ the reference's API ∪ SPARQL union; first-wins dedup by
pass priority ≙ its anti-join J4. Skew: Zipfian keys (common surnames) are
capped on the self-join side — blocks above ``max_block_size`` are dropped
from that pass (counted in metrics; other passes still cover the pairs) —
plus AQE skew-join handles residual imbalance at runtime.

At 10^12 turns: the dictionary side is broadcast (no shuffle); the
entity↔entity self-join shuffles once per pass on the block key, which is
the minimal shuffle any blocking scheme needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import token_sort
from ..functions.similarity import lsh_keys_udf, surname_key_udf

PASS_PRIORITY = {"prefix": 1, "metaphone": 2, "lsh": 3}
PREFIX_LEN = 6


def add_block_keys(
    df: DataFrame, name_col: str = "norm_name", type_col: str = "entity_type"
) -> DataFrame:
    """Project the three pass keys. One narrow select — no shuffle.

    Keys are entity_type-scoped (P5 parity: the reference dispatches
    candidate retrieval by type and keyword-filters cross-type hits,
    wikidata_cultural_client.py:337-343) — a person never blocks with a
    place, which also shrinks the hottest blocks.
    """
    sorted_name = token_sort(F.col(name_col))
    t = F.col(type_col)
    return (
        df.withColumn("_token_sorted", sorted_name)
        .withColumn(
            "block_prefix",
            F.concat_ws(":", t, F.substring(F.col("_token_sorted"), 1, PREFIX_LEN)),
        )
        .withColumn("_mp", surname_key_udf(F.col(name_col)))
        .withColumn(
            "block_metaphone",
            F.when(F.col("_mp") != "", F.concat_ws(":", t, F.col("_mp"))).otherwise(
                F.lit("")
            ),
        )
        .drop("_mp")
        .withColumn(
            "block_lsh",
            F.transform(
                lsh_keys_udf(F.col("_token_sorted")),
                lambda k: F.concat_ws(":", t, k),
            ),
        )
    )


def _pass_frames(keyed: DataFrame, id_col: str) -> dict[str, DataFrame]:
    """(id, block_key) per pass, LSH exploded."""
    return {
        "prefix": keyed.select(F.col(id_col).alias("id"), F.col("block_prefix").alias("block_key")),
        "metaphone": keyed.select(F.col(id_col).alias("id"), F.col("block_metaphone").alias("block_key")).filter(F.col("block_key") != ""),
        "lsh": keyed.select(F.col(id_col).alias("id"), F.explode("block_lsh").alias("block_key")),
    }


def dictionary_candidates(entities_keyed: DataFrame, dictionary_keyed: DataFrame) -> DataFrame:
    """Entity ↔ authority-dictionary candidate pairs (J3).

    The dictionary side is small by construction (it replaces an external
    authority service) → broadcast every pass: zero shuffle of the
    10^12-row entity side.
    Returns (left_key=entity_key, right_key=auth_id, block_pass, block_key).
    """
    ent = _pass_frames(entities_keyed, "entity_key")
    dic = _pass_frames(dictionary_keyed, "auth_id")
    parts = []
    for name in ("prefix", "metaphone", "lsh"):
        e = ent[name].withColumnRenamed("id", "left_key")
        d = F.broadcast(dic[name].withColumnRenamed("id", "right_key"))
        parts.append(
            e.join(d, "block_key").select(
                "left_key",
                "right_key",
                F.lit(name).alias("block_pass"),
                "block_key",
            )
        )
    return dedup_pairs(parts[0].unionByName(parts[1]).unionByName(parts[2]))


def self_candidates(
    entities_keyed: DataFrame, max_block_size: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """Entity ↔ entity candidate pairs within shared blocks (feeds J7
    clustering — the reference never compares entity↔entity; the north rule
    mandates it).

    Within each block the pair count is C(n,2) → blocks above
    ``max_block_size`` are dropped from that pass and reported. Returns
    (pairs, dropped_blocks_metrics).
    """
    frames = _pass_frames(entities_keyed, "entity_key")
    parts, dropped = [], []
    for name, f in frames.items():
        f = f.withColumnRenamed("id", "k")
        sizes = f.groupBy("block_key").agg(F.count("*").alias("block_n"))
        ok = sizes.filter(F.col("block_n") <= max_block_size)
        dropped.append(
            sizes.filter(F.col("block_n") > max_block_size)
            .withColumn("block_pass", F.lit(name))
            .select("block_pass", "block_key", "block_n")
        )
        fk = f.join(ok.select("block_key"), "block_key")
        left = fk.select("block_key", F.col("k").alias("left_key"))
        right = fk.select("block_key", F.col("k").alias("right_key"))
        parts.append(
            left.join(right, "block_key")
            .filter(F.col("left_key") < F.col("right_key"))
            .select(
                "left_key",
                "right_key",
                F.lit(name).alias("block_pass"),
                "block_key",
            )
        )
    pairs = dedup_pairs(parts[0].unionByName(parts[1]).unionByName(parts[2]))
    metrics = dropped[0].unionByName(dropped[1]).unionByName(dropped[2])
    return pairs, metrics


def dedup_pairs(pairs: DataFrame) -> DataFrame:
    """J4 first-wins dedup across passes by pass priority — one hash
    aggregate, deterministic (min over a (priority, pass, key) struct),
    never an order-dependent dropDuplicates."""
    prio = F.when(F.col("block_pass") == "prefix", 1).when(
        F.col("block_pass") == "metaphone", 2
    ).otherwise(3)
    return (
        pairs.withColumn("_prio", prio)
        .groupBy("left_key", "right_key")
        .agg(F.min(F.struct("_prio", "block_pass", "block_key")).alias("w"))
        .select(
            "left_key",
            "right_key",
            F.col("w.block_pass").alias("block_pass"),
            F.col("w.block_key").alias("block_key"),
        )
    )
