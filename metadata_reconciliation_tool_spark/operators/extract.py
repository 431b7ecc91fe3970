"""Entity-mention extraction from transcripts — set-oriented rebuild of the
reference's per-row extraction loop.

Reference semantics replicated (SURVEY.md §2.2, §3.1):

- P1/P9 null-empty-nan filter    reconciliation_engine.py:476-478
- P2 column projection            reconciliation_engine.py:468-501
- F4 multi-value split            metadata_parser.py:51,262-278
- F13 type parse / F14 inference  reconciliation_engine.py:503-539,
                                  enhanced_reconciliation_engine.py:294-369
- F5 md5 entity key               reconciliation_engine.py:70-74
- W5 stable (conv_id, turn_idx) ordering guards the per-turn text-equality
  invariant (database.py:230,410)

The transcripts' analogue of the reference's entity_column/type_column
config is the trigger-phrase table: '<trigger> <mention tail>' marks a typed
mention (enhanced_reconciliation_engine.py:231-254 resolves columns the same
way — config, not inference). F14 regex inference remains available via
:func:`infer_entity_type_expr` for untyped mentions.

Everything is one declarative chain: explode over trigger patterns →
regexp_extract → multi-value split/explode → clean → normalize → key.
Catalyst pushes the text IS NOT NULL filters into the scan; zero Python in
the row path except the (ASCII-gated) NFKC pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import (
    clean_value,
    entity_key,
    multi_value_split,
    nonempty_name_filter,
    normalize_name_unicode,
)

TRIGGER_PATTERNS = {
    "person": r"met with (.*)$",
    "organization": r"works at (.*)$",
    "place": r"traveled to (.*)$",
}

# F13: type-synonym parse ladder (subset of the reference's ~25-key map).
TYPE_SYNONYMS = {
    "person": ["person", "people", "author", "artist", "creator", "individual"],
    "place": ["place", "location", "city", "country", "geographic"],
    "organization": ["organization", "org", "institution", "museum", "library",
                     "university", "company", "corporate"],
    "subject": ["subject", "topic", "theme", "keyword", "category"],
}


def infer_entity_type_expr(name: Column) -> Column:
    """F14: infer type from the surface form — title/suffix indicators, the
    capitalized first-last person regex, the 'Last, First' comma rule, and
    org/place keyword lists (reconciliation_engine.py:524-539)."""
    lower = F.lower(name)
    org_kw = r"(museum|institute|university|library|society|college|company|corporation|foundation)"
    place_kw = r"(lake|mount|port|city|county|river|north|south|east|west)"
    return (
        F.when(lower.rlike(r"^(mr|mrs|ms|dr|prof|sir|dame)\.?\s"), "person")
        .when(lower.rlike(org_kw), "organization")
        .when(lower.rlike(place_kw), "place")
        .when(name.rlike(r"^[A-Z][a-z]+\s+[A-Z][a-z]+$"), "person")
        .when(name.rlike(r"^[A-Z][a-z]+,\s*[A-Z][a-z]+$"), "person")
        .otherwise("unknown")
    )


def parse_entity_type_expr(raw: Column) -> Column:
    """F13: synonym-map parse with contains fallback."""
    lower = F.lower(F.trim(raw))
    expr = None
    for canonical, syns in TYPE_SYNONYMS.items():
        cond = lower.isin(syns)
        expr = F.when(cond, canonical) if expr is None else expr.when(cond, canonical)
    for canonical, syns in TYPE_SYNONYMS.items():
        for s in syns:
            expr = expr.when(lower.contains(s), canonical)
    return expr.otherwise("unknown")


def extract_entities(transcripts: DataFrame) -> DataFrame:
    """transcripts → ENTITIES-schema DataFrame (one row per mention)."""
    mention_structs = F.array(
        *[
            F.struct(
                F.lit(etype).alias("entity_type"),
                F.regexp_extract(F.col("text"), pat, 1).alias("raw"),
            )
            for etype, pat in TRIGGER_PATTERNS.items()
        ]
    )
    exploded = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.explode(mention_structs).alias("m"),
        )
        .select("conv_id", "turn_idx", "m.entity_type", "m.raw")
        .filter(F.col("raw") != "")
    )
    # F4 multi-value split (comma-free separator set: entity mentions keep
    # 'Last, First' whole — see multi_value_split docstring), then P8 clean
    split = exploded.select(
        "conv_id",
        "turn_idx",
        "entity_type",
        F.explode(
            multi_value_split(F.col("raw"), ["; ", "|", " and ", " & "])
        ).alias("value"),
    ).withColumn("name", clean_value(F.col("value")))
    cleaned = split.filter(nonempty_name_filter(F.col("name")))
    normed = cleaned.withColumn("norm_name", normalize_name_unicode(F.col("name")))
    return normed.select(
        entity_key(F.col("norm_name"), F.col("entity_type")).alias("entity_key"),
        "conv_id",
        "turn_idx",
        "name",
        "norm_name",
        "entity_type",
        F.create_map(F.lit("source"), F.lit("transcripts")).alias("context"),
    ).filter(F.length("norm_name") > 1)


def distinct_entities(entities: DataFrame) -> DataFrame:
    """Dedup-before-compute — the Spark-native equivalent of the reference's
    SimpleCache hit path (reconciliation_engine.py:354-362): compute each
    distinct (norm_name, entity_type) once, join results back to mentions.

    Deterministic representative row: the min (conv_id, turn_idx, name) per
    key (never dropDuplicates where order matters — SURVEY.md §7.5).

    Skew-safe by aggregation, not window: a row_number window partitioned by
    entity_key routes EVERY mention of a hot key (a celebrity entity across
    10¹² turns) through one task's sort; groupBy + min/min_by instead get
    map-side partial aggregation, so a hot key collapses to one row per map
    task before the shuffle. Determinism note: carried columns (norm_name,
    entity_type, context) are constant per entity_key by construction
    (entity_key = md5(norm_name:entity_type); context a literal), so
    min_by ties cannot diverge."""
    order = F.struct("conv_id", "turn_idx", "name")
    carried = [
        c
        for c in entities.columns
        if c not in ("entity_key", "conv_id", "turn_idx", "name")
    ]
    agg = entities.groupBy("entity_key").agg(
        F.min(order).alias("__o"),
        *[F.min_by(c, order).alias(c) for c in carried],
    )
    return agg.select(
        "entity_key",
        F.col("__o.conv_id").alias("conv_id"),
        F.col("__o.turn_idx").alias("turn_idx"),
        F.col("__o.name").alias("name"),
        *carried,
    )


def prepare_dictionary(dictionary: DataFrame) -> DataFrame:
    """Normalize a (possibly multi-source) authority dictionary for blocking:

    - default ``source`` = 'wikidata' and null ``n_sources``/``term_type``
      when the caller passes a single-source dictionary (round-1 shape);
    - A3-style per-(norm_label, source) dedup — the Spark rebuild of the
      reference's match dedup ``key = (match.name.lower().strip(),
      match.source)`` (reconciliation_engine.py:425-437), deterministic
      first-wins by auth_id (never an order-dependent dropDuplicates).

    The union of sources (Wikidata ∪ VIAF ∪ Getty per entity type,
    reconciliation_engine.py:388-399) is the dictionary itself — callers
    union per-source frames upstream; this function makes the union safe."""
    from pyspark.sql import Window as W

    if "source" not in dictionary.columns:
        dictionary = dictionary.withColumn("source", F.lit("wikidata"))
    if "n_sources" not in dictionary.columns:
        dictionary = dictionary.withColumn("n_sources", F.lit(None).cast("int"))
    if "term_type" not in dictionary.columns:
        dictionary = dictionary.withColumn("term_type", F.lit(None).cast("string"))
    w = W.partitionBy("norm_label", "source").orderBy("auth_id")
    return (
        dictionary.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
