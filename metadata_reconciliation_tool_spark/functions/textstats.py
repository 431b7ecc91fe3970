"""Text-analysis functions for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen) so each has an
exact ANSI-SQL oracle twin in __spark_entry__.oracle_sql(). No UDFs here —
at 100 TB these run on every document, and the Arrow round-trip would
dominate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation marks.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]
# language marker sets for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "with", "for"],
    "de": ["der", "die", "das", "und", "mit", "für"],
    "fr": ["le", "la", "les", "et", "avec", "pour"],
    "es": ["el", "los", "las", "y", "con", "para"],
}

PUNCT_CLASS = r"[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens (empties removed) — Python str.split() parity."""
    return F.array_remove(F.split(F.trim(text), r"\s+"), "")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    stripped = F.regexp_replace(text, PUNCT_CLASS, "")
    return F.when(
        F.length(text) > 0,
        (F.length(text) - F.length(stripped)).cast("double") / F.length(text),
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens (lowercased whitespace tokens)."""
    sw = stopwords or STOPWORDS_EN
    toks = ws_tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return F.when(
        F.size(toks) > 0, hits.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: length band +
    moderate punctuation + healthy stopword presence. Deterministic and
    SQL-twinnable; the exact blend is a pipeline convention, not a model."""
    n = F.length(text)
    length_ok = F.when((n >= 50) & (n <= 20000), 1.0).when(n > 0, 0.5).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.5)
    sw_ok = F.when(stopword_ratio(text) >= 0.05, 1.0).otherwise(0.5)
    return (length_ok * 0.5 + punct_ok * 0.25 + sw_ok * 0.25).cast("double")


def _membership(words: list[str]):
    # single-arg lambda factory: a default-arg lambda (lambda t, m=...) would
    # make Spark's higher-order-function binder pass TWO lambda variables
    return lambda t: t.isin(*words)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-overlap counts (distinct marker words present)."""
    toks = F.array_distinct(ws_tokens(F.lower(text)))
    return {
        lang: F.size(F.filter(toks, _membership(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language by marker overlap; deterministic tie-break by
    language code ascending; 'und' when nothing matches."""
    scores = lang_scores(text)
    langs = sorted(scores)  # asc order = tie-break priority
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = None
    for lg in langs:
        cond = (scores[lg] == best) & (best > 0)
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return expr.otherwise("und")


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    lowercase token set — the dedup-key analogue of the reference's md5
    cache key (F5, reconciliation_engine.py:70-74) lifted to documents."""
    toks = F.array_sort(F.array_distinct(ws_tokens(F.lower(text))))
    return F.md5(F.array_join(toks, " "))


def minhash_key(text: Column, seed: int) -> Column:
    """One md5-based MinHash value over the lowercase word set:
    min over words of md5('{seed}:' || word). SQL-twinnable (DuckDB
    list_min/list_transform) unlike the crc32+permutation family used for
    name blocking."""
    toks = F.array_distinct(ws_tokens(F.lower(text)))
    hashed = F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{seed}:"), t)))
    return F.array_min(hashed)


SIMHASH_BITS = 16
_HIGH_NIBBLES = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash_bitstring(text: Column) -> Column:
    """16-bit SimHash as a bitstring column ('0110…').

    Bit i = sign of Σ_tokens (±1), where a token votes +1 iff the i-th hex
    nibble of md5(token) has its high bit set. Pure Column exprs (and an
    exact SQL twin) — per-token md5 via transform, per-bit vote via
    filter/size.
    """
    toks = ws_tokens(F.lower(text))
    hashes = F.transform(toks, lambda t: F.md5(t))
    n = F.size(hashes)

    def _high_bit_at(i: int):
        return lambda h: F.substring(h, i, 1).isin(*_HIGH_NIBBLES)

    bits = []
    for i in range(1, SIMHASH_BITS + 1):
        ones = F.size(F.filter(hashes, _high_bit_at(i)))
        # +1 votes = ones, -1 votes = n - ones → sign positive iff 2*ones >= n
        bits.append(F.when((n > 0) & (2 * ones >= n), F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def hamming_bitstring(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length bitstrings."""
    pairs = F.arrays_zip(F.split(a, "(?!^)"), F.split(b, "(?!^)"))
    return F.size(F.filter(pairs, lambda p: p["0"] != p["1"]))
