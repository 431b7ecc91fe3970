"""Column classification / metadata profiling (SURVEY.md P4, §3.3).

The reference classifies CSV columns by header regexes, then falls back to
sampling data and testing per-class heuristics at a 20% threshold
(metadata_parser.py:86-194, pattern lists :31-51). Driver-side profiling by
design: it reads a bounded sample (df.limit), decides the extraction
config, and the pipeline proper stays fully declarative.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# header-name patterns per class (metadata_parser.py:31-51 spirit)
HEADER_PATTERNS = {
    "person": [r"creator", r"author", r"artist", r"name", r"person", r"by$"],
    "place": [r"place", r"location", r"city", r"country", r"geograph", r"region"],
    "subject": [r"subject", r"topic", r"keyword", r"theme", r"categor", r"tag"],
}

_PERSON_RE = re.compile(r"^[A-Z][a-z]+\s+[A-Z][a-z]+$|^[A-Z][a-z]+,\s*[A-Z][a-z]+")
_PLACE_WORDS = {
    "city", "county", "lake", "mount", "river", "north", "south", "east",
    "west", "port", "new",
}
_SUBJECT_HINTS = {";", "--"}


def _looks_like_person_names(values: list[str], threshold: float = 0.2) -> bool:
    """Data heuristic: ≥20% of sampled values shaped like 'First Last' or
    'Last, First' (metadata_parser.py:129-151)."""
    hits = sum(1 for v in values if v and _PERSON_RE.match(v.strip()))
    return bool(values) and hits / len(values) >= threshold


def _looks_like_places(values: list[str], threshold: float = 0.2) -> bool:
    hits = sum(
        1
        for v in values
        if v and (set(v.lower().split()) & _PLACE_WORDS)
    )
    return bool(values) and hits / len(values) >= threshold


def _looks_like_subjects(values: list[str], threshold: float = 0.2) -> bool:
    """Multi-value-ish cells (separators) hint at subject/keyword columns
    (metadata_parser.py:172-194)."""
    hits = sum(
        1 for v in values if v and any(s in v for s in _SUBJECT_HINTS)
    )
    return bool(values) and hits / len(values) >= threshold


def classify_columns(df: DataFrame, sample_rows: int = 50) -> dict[str, str]:
    """column name → person | place | subject | unknown.

    Header regexes first (cheap, no data read); data-sampling heuristics as
    fallback on one bounded sample (a single limit() scan — never a full
    pass; this runs on the driver before the plan is built)."""
    out: dict[str, str] = {}
    undecided: list[str] = []
    for col in df.columns:
        low = col.lower()
        for cls, pats in HEADER_PATTERNS.items():
            if any(re.search(p, low) for p in pats):
                out[col] = cls
                break
        else:
            undecided.append(col)
    if undecided:
        sample = df.select(*undecided).limit(sample_rows).collect()
        for col in undecided:
            values = [str(r[col]) for r in sample if r[col] is not None]
            if _looks_like_person_names(values):
                out[col] = "person"
            elif _looks_like_places(values):
                out[col] = "place"
            elif _looks_like_subjects(values):
                out[col] = "subject"
            else:
                out[col] = "unknown"
    return out


def resolve_column(df: DataFrame, requested: str) -> str | None:
    """P3: case-insensitive then substring fallback column resolution
    (enhanced_reconciliation_engine.py:231-254)."""
    if requested in df.columns:
        return requested
    lower_map = {c.lower(): c for c in df.columns}
    if requested.lower() in lower_map:
        return lower_map[requested.lower()]
    for c in df.columns:
        if requested.lower() in c.lower() or c.lower() in requested.lower():
            return c
    return None
