"""Deterministic synthetic fixtures (FIXTURES.md §1–§5).

Generates, with a fixed seed and no wall-clock reads:

- an entity pool with surname-sibling groups (hard negatives),
- rule-based surface variants (the exact variance the reference's
  normalization + scoring absorb — FIXTURES.md §3 maps each rule to the
  reference code path it exercises),
- a **distributed** transcripts table (spark.range + broadcast variant join
  — no driver-side row lists, so the same generator scales to bench sizes),
- the broadcast reference dictionary (replacing live Wikidata/VIAF/Getty),
- labeled pairs with shared blocking keys (the F1 ≥ 0.99 gate input),
- expected transitive clusters (incl. A~B, B~C chains).

Every key/norm computation here uses the Python twins of the Spark
expressions (normalize_name_py / surname_key_py / lsh_keys_py) so generator
keys and pipeline keys agree bit-for-bit; twin parity is pinned in tests.
"""

from __future__ import annotations

import hashlib
import itertools
import random
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.normalize import normalize_name_py
from .functions.similarity import lsh_keys_py, surname_key_py

BASE_EPOCH = "2025-01-01 00:00:00"  # seeded base, never now()

# mention trigger phrases — the transcripts' analogue of the reference's
# configured entity_column/type_column (enhanced_reconciliation_engine.py:231-254):
# the trigger encodes the entity type, the tail of the turn is the mention.
TRIGGERS = {
    "person": "met with",
    "organization": "works at",
    "place": "traveled to",
}

FILLER = [
    "the quarterly report is ready for review",
    "please rerun the failing pipeline job",
    "let me check the database schema first",
    "the deployment finished without errors",
    "can you summarize the last meeting notes",
    "i will open a ticket for the regression",
]

_FIRST = [
    "william", "emma", "charles", "margaret", "henry", "beatrice", "oliver",
    "sophia", "arthur", "eleanor", "frederick", "josephine", "theodore",
    "vivian", "nathaniel", "rosalind", "gregory", "matilda", "quentin",
    "isadora",
]
_LAST = [
    "shakespeare", "vanderberg", "ashworth", "pemberton", "kingsley",
    "fairchild", "lockwood", "marchetti", "oconnell", "whitfield",
    "harrington", "castellano", "brightwater", "montgomery", "fitzgerald",
    "abernathy", "rutherford", "blackwood", "stanhope", "winterbourne",
]

# Syllable pools: at bench scales (thousands of entities) fixed name lists
# would make every surname a hot block and the pair count quadratic — the
# syllable product space (24³ ≈ 13.8k surnames) keeps block sizes realistic
# at any pool size while staying fully deterministic.
_SYL_FIRST = ["an", "bel", "cor", "dra", "eli", "fio", "gwen", "hal", "ia",
              "jo", "kat", "leo", "mira", "nor", "ot", "pris", "quin", "rose"]
_SYL_LAST = ["an", "ber", "car", "den", "el", "for", "gar", "hil", "ing",
             "jor", "kel", "lan", "mor", "nor", "ol", "per", "quin", "ros",
             "sta", "ter", "ul", "ver", "wick", "yar"]


def _gen_first(rng: random.Random) -> str:
    if rng.random() < 0.4:
        return rng.choice(_FIRST)
    return "".join(rng.sample(_SYL_FIRST, 2))


def _gen_last(rng: random.Random) -> str:
    if rng.random() < 0.2:
        return rng.choice(_LAST)
    return "".join(rng.sample(_SYL_LAST, 3))
_CITY = [
    "minneapolis", "portsmouth", "galveston", "harrisburg", "tallahassee",
    "sacramento", "providence", "chattanooga", "albuquerque", "savannah",
]
_SUBJ = ["art", "history", "science", "design", "literature", "archaeology"]
_ORG_PAT = [
    "{city} institute of {subj}",
    "museum of {subj} {city}",
    "{city} {subj} society",
    "university of {city}",
]
_PLACE_PAT = ["{city}", "lake {last}", "mount {last}", "port {city}"]


@dataclass
class PoolEntity:
    entity_id: int
    canonical: str
    entity_type: str
    description: str
    sibling_group: int  # entities sharing a surname/base token → hard negatives
    aliases: list[str] = field(default_factory=list)


def _title(s: str) -> str:
    return " ".join(w.capitalize() for w in s.split())


def entity_pool(n_entities: int = 40, seed: int = 42) -> list[PoolEntity]:
    rng = random.Random(seed)
    pool: list[PoolEntity] = []
    seen_names: set[str] = set()
    group = 0
    eid = 0

    def _claim(name: str) -> bool:
        # canonical names must be globally unique — a cross-group name
        # collision would merge two ground-truth clusters by construction
        key = normalize_name_py(name)
        if key in seen_names:
            return False
        seen_names.add(key)
        return True

    while len(pool) < n_entities:
        group += 1
        kind = rng.choice(["person", "person", "organization", "place"])
        if kind == "person":
            last = _gen_last(rng)
            # sibling first names must start with distinct letters
            # (keeps the initials-subset rule from linking siblings)
            firsts = [_gen_first(rng), _gen_first(rng)]
            while firsts[0][0] == firsts[1][0] or firsts[0] == firsts[1]:
                firsts = [_gen_first(rng), _gen_first(rng)]
            for first in firsts[: max(1, min(2, n_entities - len(pool)))]:
                name = _title(f"{first} {last}")
                if not _claim(name):
                    continue
                pool.append(
                    PoolEntity(
                        eid, name, "person",
                        f"{first} {last} was a notable figure in {rng.choice(_SUBJ)}",
                        group,
                    )
                )
                eid += 1
        elif kind == "organization":
            pat = rng.choice(_ORG_PAT)
            name = _title(pat.format(city=rng.choice(_CITY), subj=rng.choice(_SUBJ), last=_gen_last(rng)))
            if not _claim(name):
                continue
            pool.append(
                PoolEntity(eid, name, "organization",
                           f"a cultural organization known as {name.lower()}", group)
            )
            eid += 1
        else:
            pat = rng.choice(_PLACE_PAT)
            name = _title(pat.format(city=rng.choice(_CITY), last=_gen_last(rng)))
            if not _claim(name):
                continue
            pool.append(
                PoolEntity(eid, name, "place",
                           f"a geographic location called {name.lower()}", group)
            )
            eid += 1
    return pool[:n_entities]


# ---------------------------------------------------------------------------
# variant rules (FIXTURES.md §3)
# ---------------------------------------------------------------------------


def _typo(word: str) -> str:
    if len(word) < 5:
        return word
    i = len(word) // 2
    return word[:i] + word[i + 1 :]


def _respell(word: str) -> str:
    # metaphone-preserving respellings only (phonetic pass must still collide)
    if "ea" in word:
        return word.replace("ea", "ee", 1)
    if "ph" in word:
        return word.replace("ph", "f", 1)
    if word.endswith("e"):
        return word[:-1]
    if "ck" in word:
        return word.replace("ck", "k", 1)
    return word + "e"


def variants_for(ent: PoolEntity) -> list[tuple[str, str]]:
    """(surface, rule) pairs for one pool entity — deterministic, no rng."""
    name = ent.canonical
    toks = name.split()
    longest_i = max(range(len(toks)), key=lambda i: (len(toks[i]), toks[i]))
    out = [
        (name, "canonical"),
        (name.upper(), "case_upper"),
        (name.lower(), "case_lower"),
        ("  " + name.replace(" ", "   ") + " ", "whitespace"),
        (f"[{name}]", "brackets"),
        (f'"{name}"', "quotes"),
    ]
    typo_toks = toks.copy()
    typo_toks[longest_i] = _typo(typo_toks[longest_i].lower()).capitalize()
    out.append((" ".join(typo_toks), "typo"))
    resp_toks = toks.copy()
    resp_toks[longest_i] = _respell(resp_toks[longest_i].lower()).capitalize()
    out.append((" ".join(resp_toks), "phonetic"))
    if ent.entity_type == "person" and len(toks) == 2:
        out.append((f"{toks[1]}, {toks[0]}", "token_reorder"))
        out.append((f"Dr. {name}", "title_prefix"))
        out.append((f"{toks[0][0]}. {toks[1]}", "initials"))
    return out


@dataclass
class Variant:
    entity_id: int
    surface: str
    rule: str
    entity_type: str
    norm: str
    key: str
    prefix_key: str
    surname_key: str
    lsh_keys: list[str]


def entity_key_py(norm: str, entity_type: str) -> str:
    """Python twin of functions.normalize.entity_key (F5 md5 key)."""
    return hashlib.md5(f"{norm}:{entity_type}:{{}}".encode()).hexdigest()


def token_sort_py(norm: str) -> str:
    return " ".join(sorted(norm.split()))


def build_variants(pool: list[PoolEntity]) -> list[Variant]:
    seen: dict[str, Variant] = {}
    out: list[Variant] = []
    for ent in pool:
        for surface, rule in variants_for(ent):
            norm = normalize_name_py(surface)
            if not norm or len(norm) <= 1:
                continue
            key = entity_key_py(norm, ent.entity_type)
            if key in seen:
                continue  # normalization-identical variant (case etc.) collapses
            ts = token_sort_py(norm)
            et = ent.entity_type
            sk = surname_key_py(norm)
            v = Variant(
                ent.entity_id, surface, rule, et, norm, key,
                prefix_key=f"{et}:{ts[:6]}",
                surname_key=f"{et}:{sk}" if sk else "",
                lsh_keys=[f"{et}:{k}" for k in lsh_keys_py(ts)],
            )
            seen[key] = v
            out.append(v)
    return out


def shared_block_key(a: Variant, b: Variant) -> tuple[str, str] | None:
    """(block_pass, key) shared by both variants, pass-priority order."""
    if a.prefix_key == b.prefix_key:
        return ("prefix", a.prefix_key)
    if a.surname_key and a.surname_key == b.surname_key:
        return ("metaphone", a.surname_key)
    common = sorted(set(a.lsh_keys) & set(b.lsh_keys))
    if common:
        return ("lsh", common[0])
    return None


def build_labeled_pairs(pool: list[PoolEntity], variants: list[Variant]) -> pd.DataFrame:
    by_ent: dict[int, list[Variant]] = {}
    for v in variants:
        by_ent.setdefault(v.entity_id, []).append(v)
    by_group: dict[int, list[PoolEntity]] = {}
    for e in pool:
        by_group.setdefault(e.sibling_group, []).append(e)

    rows = []
    # positives: canonical × every other variant of the same entity
    for ent_vs in by_ent.values():
        canon = ent_vs[0]
        for v in ent_vs[1:]:
            sk = shared_block_key(canon, v)
            if sk is None:
                continue  # unreachable by any pass — excluded (counted in tests)
            l, r = sorted([canon.key, v.key])
            rows.append((l, r, sk[1], True, v.rule))
    # negatives: canonical pairs across sibling entities (shared surname)
    # plus cross-entity variant pairs that happen to share a key
    for group in by_group.values():
        for ea, eb in itertools.combinations(group, 2):
            va, vb = by_ent.get(ea.entity_id), by_ent.get(eb.entity_id)
            if not va or not vb:
                continue
            for a, b in itertools.product(va[:3], vb[:3]):
                sk = shared_block_key(a, b)
                if sk is None:
                    continue
                l, r = sorted([a.key, b.key])
                rows.append((l, r, sk[1], False, f"neg_sibling:{a.rule}x{b.rule}"))
    df = pd.DataFrame(
        rows, columns=["left_key", "right_key", "block_key", "is_match", "variant_rule"]
    ).drop_duplicates(["left_key", "right_key"])
    return df.reset_index(drop=True)


def build_expected_clusters(variants: list[Variant]) -> pd.DataFrame:
    """Ground-truth clusters, conditioned on blocking reachability.

    Within one entity, variants form the expected cluster graph through
    pairs that share a blocking key (union-find over shared_block_key) —
    the transitive-closure oracle must not demand links blocking can never
    present for scoring (the north-rule gate is "at the same blocking
    keys"). Blocking recall itself is asserted separately in tests.
    Chains (A~B, B~C with A,C sharing no key) force transitivity.
    """
    by_ent: dict[int, list[Variant]] = {}
    for v in variants:
        by_ent.setdefault(v.entity_id, []).append(v)
    rows = []
    for vs in by_ent.values():
        parent = {v.key: v.key for v in vs}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in itertools.combinations(vs, 2):
            if shared_block_key(a, b) is not None:
                ra, rb = find(a.key), find(b.key)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comps: dict[str, list[str]] = {}
        for v in vs:
            comps.setdefault(find(v.key), []).append(v.key)
        for members in comps.values():
            cid = min(members)
            for k in members:
                rows.append((k, cid))
    return pd.DataFrame(rows, columns=["entity_key", "cluster_id"])


# ---------------------------------------------------------------------------
# Spark-side table builders
# ---------------------------------------------------------------------------


def gen_dictionary(spark: SparkSession, pool: list[PoolEntity]) -> DataFrame:
    rows = []
    for e in pool:
        norm = normalize_name_py(e.canonical)
        rows.append(
            {
                "auth_id": f"Q{e.entity_id + 1000}",
                "label": e.canonical,
                "norm_label": norm,
                "description": e.description,
                "entity_type": e.entity_type,
                "aliases": [e.canonical.upper()],
                "n_sources": (e.entity_id % 10) + 1,
                "external_ids": {"viaf": f"viaf{e.entity_id}"},
            }
        )
    from .schemas import DICTIONARY

    return spark.createDataFrame(pd.DataFrame(rows), schema=DICTIONARY)


def gen_multisource_dictionary(spark: SparkSession, pool: list[PoolEntity]) -> DataFrame:
    """Wikidata ∪ VIAF ∪ Getty dictionary (reconciliation_engine.py:388-399):
    every entity has a Wikidata row; every even entity_id also a VIAF row
    (with a source count for the F9 boost) plus a DUPLICATE VIAF row with a
    higher auth_id (exercises the per-(norm_label, source) A3 dedup — only
    the min-auth_id row may reach blocking); every third a Getty row whose
    term_type alternates preferred/alternate (F10 boost)."""
    rows = []
    for e in pool:
        norm = normalize_name_py(e.canonical)
        base = {
            "label": e.canonical,
            "norm_label": norm,
            "description": e.description,
            "entity_type": e.entity_type,
            "aliases": [e.canonical.upper()],
            "external_ids": {"viaf": f"viaf{e.entity_id}"},
        }
        rows.append(
            {**base, "auth_id": f"Q{e.entity_id + 1000}", "source": "wikidata",
             "n_sources": None, "term_type": None}
        )
        if e.entity_id % 2 == 0:
            n = (e.entity_id % 10) + 1
            rows.append(
                {**base, "auth_id": f"V{e.entity_id + 1000}", "source": "viaf",
                 "n_sources": n, "term_type": None}
            )
            rows.append(  # duplicate (norm_label, source) — must be A3-deduped
                {**base, "auth_id": f"W{e.entity_id + 1000}", "source": "viaf",
                 "n_sources": n, "term_type": None}
            )
        if e.entity_id % 3 == 0:
            rows.append(
                {**base, "auth_id": f"G{e.entity_id + 1000}", "source": "getty",
                 "n_sources": None,
                 "term_type": "preferred" if e.entity_id % 2 == 0 else "alternate"}
            )
    from .schemas import DICTIONARY_MULTISOURCE

    # createDataFrame(pandas, schema) matches columns by POSITION — order them
    cols = [f.name for f in DICTIONARY_MULTISOURCE.fields]
    return spark.createDataFrame(pd.DataFrame(rows)[cols], schema=DICTIONARY_MULTISOURCE)


def gen_transcripts(
    spark: SparkSession,
    variants: list[Variant],
    n_convs: int = 128,
    turns_per_conv: int = 16,
    mention_every: int = 3,
) -> DataFrame:
    """Distributed transcripts: spark.range → arithmetic columns → broadcast
    join against the (small) variant table. No driver-side row list, so the
    identical code generates 2k turns for pytest and 10^8 turns for bench.

    Every ``mention_every``-th turn carries one entity mention as the tail
    of the text after its type's trigger phrase; other turns are filler.
    """
    n_variants = len(variants)
    vdf = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "variant_idx": i,
                    "surface": v.surface,
                    "trigger": TRIGGERS[v.entity_type],
                }
                for i, v in enumerate(variants)
            ]
        )
    )
    n = n_convs * turns_per_conv
    base = (
        spark.range(n)
        .withColumn("conv_id", F.format_string("conv_%08d", (F.col("id") / turns_per_conv).cast("long")))
        .withColumn("turn_idx", F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int"))
        .withColumn("role", F.element_at(F.lit(["user", "assistant", "tool"]), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")))
        .withColumn("tool", F.when(F.col("role") == "tool", F.concat(F.lit("tool_"), F.pmod(F.col("id"), F.lit(5)).cast("string"))))
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(BASE_EPOCH).cast("timestamp"))
                + (F.col("id") / turns_per_conv).cast("long") * 3600
                + F.pmod(F.col("id"), F.lit(turns_per_conv)) * 7
            ),
        )
        .withColumn(
            "variant_idx",
            F.when(F.pmod(F.col("id"), F.lit(mention_every)) == 0, F.pmod((F.col("id") / F.lit(mention_every)).cast("long"), F.lit(n_variants))).otherwise(F.lit(None)),
        )
        .withColumn("filler", F.element_at(F.lit(FILLER), (F.pmod(F.col("id"), F.lit(len(FILLER))) + 1).cast("int")))
    )
    joined = base.join(F.broadcast(vdf), "variant_idx", "left")
    return joined.select(
        "conv_id",
        "turn_idx",
        "role",
        F.when(
            F.col("surface").isNotNull(),
            F.concat_ws(" ", F.col("filler"), F.col("trigger"), F.col("surface")),
        )
        .otherwise(F.col("filler"))
        .alias("text"),
        "tool",
        "ts",
    )


def fixture_bundle(
    spark: SparkSession,
    n_entities: int = 40,
    n_convs: int = 128,
    turns_per_conv: int = 16,
    seed: int = 42,
) -> dict:
    pool = entity_pool(n_entities, seed)
    variants = build_variants(pool)
    return {
        "pool": pool,
        "variants": variants,
        "transcripts": gen_transcripts(spark, variants, n_convs, turns_per_conv),
        "dictionary": gen_dictionary(spark, pool),
        "labeled_pairs": build_labeled_pairs(pool, variants),
        "expected_clusters": build_expected_clusters(variants),
    }
