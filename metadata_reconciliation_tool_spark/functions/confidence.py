"""Confidence formulas — the reference's tiered scoring, bit-for-bit, as
pure Catalyst Column expressions (no UDF: every branch is when/contains/
array_intersect, all inside whole-stage codegen).

Replicated semantics (SURVEY.md §2.8):

- F6  simple tiers      ==→1.0; substring→0.8; else word-set Jaccard
      /root/reference/app/services/reconciliation_engine.py:178-201
- F7  Wikidata cultural-client formula (THE formula named by the north star)
      exact→0.95; substring→0.5+overlap/total·0.4 (0.7 if token sets empty);
      else overlap>0→0.3+overlap/len(search)·0.4, overlap==0→0.2,
      empty→0.1; +0.1 if search term in description, capped at 1.0
      /root/reference/app/services/wikidata_cultural_client.py:263-322
- F8  prefix tiers      ==→0.95; startswith→0.85/0.75; contains→0.70/0.60;
      Jaccard>0.5→0.50+(sim−0.5)·0.4; else 0.3
      /root/reference/app/services/data_sources.py:71-101
- F9  VIAF source-count boost min(n/10, 0.2)
      /root/reference/app/services/data_sources.py:260-292
- F12 3-level bands ≥0.8 high / ≥0.6 medium / low
      /root/reference/app/services/reconciliation_engine.py:203-210
- 5-level bands ≥0.9 very_high / ≥0.7 high / ≥0.5 medium / ≥0.3 low
      /root/reference/app/services/wikidata_cultural_client.py:311-320

Inputs are assumed pre-lowercased/trimmed (the reference lowercases inside
each formula; we normalize once upstream — same result, one pass).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .normalize import distinct_tokens


def _overlap_total(a: Column, b: Column) -> tuple[Column, Column, Column, Column]:
    ta, tb = distinct_tokens(a), distinct_tokens(b)
    overlap = F.size(F.array_intersect(ta, tb)).cast("double")
    total = F.size(F.array_union(ta, tb)).cast("double")
    return ta, tb, overlap, total


def simple_score(query: Column, label: Column) -> Column:
    """F6: ==→1.0; substring-either-way→0.8; else Jaccard of word sets."""
    ta, tb, overlap, total = _overlap_total(query, label)
    return (
        F.when((query == label) & (query != ""), F.lit(1.0))
        .when((query == "") | (label == ""), F.lit(0.0))
        .when(label.contains(query) | query.contains(label), F.lit(0.8))
        .when((F.size(ta) > 0) & (F.size(tb) > 0), overlap / total)
        .otherwise(F.lit(0.0))
    )


def wikidata_confidence(
    search: Column,
    label: Column,
    description: Column | None = None,
    search_tokens: Column | None = None,
    label_tokens: Column | None = None,
    overlap_count: Column | None = None,
    total_count: Column | None = None,
) -> Column:
    """F7 — exact replica of the cultural client's piecewise formula.

    ``search_tokens``/``label_tokens``: optionally pass precomputed
    distinct-token arrays so a caller scoring millions of pairs doesn't
    re-split/re-dedup the same strings in every sub-expression.
    ``overlap_count``/``total_count``: optionally pass the already-computed
    |A ∩ B| / |A ∪ B| integer columns so the intersect is evaluated once
    per pair and shared with the caller's other formulas (round 6; the
    union is |A| + |B| − |A ∩ B| — the identical integer)."""
    if search_tokens is not None and label_tokens is not None:
        ta, tb = search_tokens, label_tokens
        if overlap_count is not None and total_count is not None:
            overlap = overlap_count.cast("double")
            total = total_count.cast("double")
        else:
            overlap = F.size(F.array_intersect(ta, tb)).cast("double")
            total = F.size(F.array_union(ta, tb)).cast("double")
    else:
        ta, tb, overlap, total = _overlap_total(search, label)
    both = (F.size(ta) > 0) & (F.size(tb) > 0)
    base = (
        F.when(search == label, F.lit(0.95))
        .when(
            label.contains(search) | search.contains(label),
            F.when(both, F.lit(0.5) + (overlap / total) * 0.4).otherwise(F.lit(0.7)),
        )
        .otherwise(
            F.when(
                both,
                F.when(overlap > 0, F.lit(0.3) + (overlap / F.size(ta)) * 0.4).otherwise(
                    F.lit(0.2)
                ),
            ).otherwise(F.lit(0.1))
        )
    )
    if description is None:
        return base
    desc = F.lower(F.trim(F.coalesce(description, F.lit(""))))
    return F.when(
        (desc != "") & desc.contains(search), F.least(base + 0.1, F.lit(1.0))
    ).otherwise(base)


def prefix_tier_score(search: Column, result: Column, has_description: Column) -> Column:
    """F8: the WikidataClient prefix-tier ladder with description boost."""
    ta, tb, overlap, total = _overlap_total(search, result)
    sim = overlap / total
    return (
        F.when(search == result, F.lit(0.95))
        .when(result.startswith(search), F.when(has_description, 0.85).otherwise(0.75))
        .when(result.contains(search), F.when(has_description, 0.70).otherwise(0.60))
        .when((total > 0) & (sim > 0.5), F.lit(0.50) + (sim - 0.5) * 0.4)
        .otherwise(F.lit(0.3))
    )


def viaf_source_boost(n_sources: Column) -> Column:
    """F9: min(source_count/10, 0.2)."""
    return F.least(n_sources.cast("double") / 10.0, F.lit(0.2))


def source_boost(source: Column, n_sources: Column, term_type: Column) -> Column:
    """Per-source score boost, keyed by the dictionary row's source:

    - viaf  → F9 min(n_sources/10, 0.2)   (data_sources.py:260-292)
    - getty → F10 +0.1 when the term type contains 'preferred'
              (data_sources.py:388-421: ``0.1 if 'preferred' in
              result_type.lower() else 0.0``)
    - wikidata / unknown → 0.0 (its description boost lives inside F7)

    Null-safe: missing n_sources/term_type boost nothing."""
    viaf = viaf_source_boost(F.coalesce(n_sources.cast("double"), F.lit(0.0)))
    getty = F.when(
        F.lower(F.coalesce(term_type, F.lit(""))).contains("preferred"), F.lit(0.1)
    ).otherwise(F.lit(0.0))
    return (
        F.when(source == "viaf", viaf)
        .when(source == "getty", getty)
        .otherwise(F.lit(0.0))
    )


def confidence_band_3(score: Column) -> Column:
    """F12: ≥0.8 high / ≥0.6 medium / low."""
    return (
        F.when(score >= 0.8, "high").when(score >= 0.6, "medium").otherwise("low")
    )


def confidence_band_5(score: Column) -> Column:
    """5-level bands (wikidata_cultural_client.py:311-320)."""
    return (
        F.when(score >= 0.9, "very_high")
        .when(score >= 0.7, "high")
        .when(score >= 0.5, "medium")
        .when(score >= 0.3, "low")
        .otherwise("very_low")
    )


def composite_match_score(
    name_align: Column,
    token_lev_ratio: Column,
    wikidata_conf: Column,
    exact_norm_equal: Column,
) -> Column:
    """Field-weighted composite used for the pairwise-match decision.

    Design (ours — the reference never compares entity↔entity): exact
    token-sorted equality is a hard 1.0; otherwise a weighted blend with
    the token-aligned name similarity (which embeds Jaro-Winkler, the U4
    initials rule, and a weakest-link penalty) as the dominant signal and
    the reference's F7 formula as a corroborating one. Weights/threshold
    are validated by the labeled-pair F1 ≥ 0.99 gate: every fixture
    variant class lands ≥ ~0.8; sibling hard negatives land ≤ ~0.6.
    """
    blend = 0.55 * name_align + 0.25 * token_lev_ratio + 0.20 * wikidata_conf
    return F.when(exact_norm_equal, F.lit(1.0)).otherwise(blend)
