"""Text-analysis functions for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen) so each has an
exact ANSI-SQL oracle twin in __spark_entry__.oracle_sql(). No UDFs here —
at 100 TB these run on every document, and the Arrow round-trip would
dominate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# every char the punctuation class [^A-Za-z0-9\s] does NOT match, for the
# translate-based counter below (\s is ASCII-only in Java regex)
_ALNUM_WS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 \t\n\x0b\f\r"
)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars.

    Counted as ``length(translate(text, alnum+ws, ''))`` — translate
    deletes every non-punctuation char, so the surviving length is the
    punctuation count, equal to the former
    ``length - length(regexp_replace(text, '[^A-Za-z0-9\\s]', ''))``
    integer for all BMP text (astral punctuation would differ; the
    document corpus contract here is BMP). Measured (round 6, local[8] on
    50k docs): ANY Java-regex op over the negated range class
    ``[^A-Za-z0-9\\s]`` cost 2.6 s and gained nothing from added cores,
    while translate runs 0.36 s and scales — the regex engine's negated
    union class takes a pathological non-bitmap path on every position."""
    hits = F.length(F.translate(text, _ALNUM_WS, ""))
    return F.when(
        F.length(text) > 0,
        hits.cast("double") / F.length(text),
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens (lowercased whitespace tokens).

    The straightforward ``F.filter(toks, t.isin(...))`` is a lambda
    higher-order function — ANY lambda HOF in a projection knocks the whole
    projection out of whole-stage codegen into the interpreted evaluator,
    which measured ~10× slower AND badly contended across local[32] threads
    (round 6; the same pathology simhash_bitstring documents). Occurrence
    counting is instead done with a single codegen'd regex over the
    space-normalized token stream: pad with spaces, count non-consuming
    space-anchored alternation matches — token-equality semantics exactly
    (lookaround anchors don't consume the separator, so adjacent stopwords
    all match). Falls back to the HOF spec for stopword lists the regex
    encoding cannot express as single tokens (empty / whitespace-bearing)."""
    import re as _re

    sw = stopwords or STOPWORDS_EN
    toks = ws_tokens(F.lower(text))
    if any((not w) or _re.search(r"\s", w) for w in sw):
        hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    else:
        padded = F.concat(
            F.lit(" "),
            F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "),
            F.lit(" "),
        )
        pattern = "(?<= )(" + "|".join(_re.escape(w) for w in sw) + ")(?= )"
        hits = F.regexp_count(padded, F.lit(pattern))
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


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-overlap counts (distinct marker words present).

    ``array_intersect`` against a literal marker array instead of a
    ``filter``+``isin`` lambda: identical counts (the token array is
    already distinct, and intersect counts each distinct marker token
    once), but no lambda HOF — the projection stays in whole-stage codegen
    (see stopword_ratio)."""
    toks = F.array_distinct(ws_tokens(F.lower(text)))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in markers])))
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


SIMHASH_BITS = 64
# For each bit b (value 8/4/2/1) of a hex nibble, the 8 hex chars that have
# that bit set. Testing "bit b of nibble" = membership in an 8-char set —
# pure Column expr in Spark AND a literal IN-list in the DuckDB twin.
NIBBLE_BIT_CHARS: dict[int, list[str]] = {
    8: ["8", "9", "a", "b", "c", "d", "e", "f"],
    4: ["4", "5", "6", "7", "c", "d", "e", "f"],
    2: ["2", "3", "6", "7", "a", "b", "e", "f"],
    1: ["1", "3", "5", "7", "9", "b", "d", "f"],
}
# bit j (1-based, MSB-first) of the 64-bit simhash lives in hex nibble
# position (j-1)//4 + 1, at nibble-bit value 8 >> ((j-1) % 4).
SIMHASH_BIT_LAYOUT = [
    ((j - 1) // 4 + 1, 8 >> ((j - 1) % 4)) for j in range(1, SIMHASH_BITS + 1)
]


def simhash_bitstring(text: Column) -> Column:
    """64-bit SimHash as a bitstring column ('0110…', 64 chars).

    Bit j = sign of Σ_tokens (±1), where a token votes +1 iff bit j of the
    first 64 bits (16 hex nibbles, MSB-first) of md5(token) is set. Pure
    Column exprs (and an exact SQL twin) — per-token md5 via transform,
    per-bit vote via filter/size on an 8-char nibble set.

    64 bits (vs round-1's 16) give a key universe that supports 4×16-bit
    pigeonhole blocking at corpus scale — 4 × 65,536 buckets instead of 512.
    """
    toks = ws_tokens(F.lower(text))
    hashes = F.transform(toks, lambda t: F.md5(t))
    n = F.size(hashes)

    def _bit_at(pos: int, bitval: int):
        chars = NIBBLE_BIT_CHARS[bitval]
        return lambda h: F.substring(h, pos, 1).isin(*chars)

    bits = []
    for pos, bitval in SIMHASH_BIT_LAYOUT:
        ones = F.size(F.filter(hashes, _bit_at(pos, bitval)))
        # +1 votes = ones, -1 votes = n - ones → sign positive iff 2*ones >= n
        bits.append(F.when((n > 0) & (2 * ones >= n), F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def simhash_bitstring_udf(text: Column) -> Column:
    """Arrow-vectorized twin of simhash_bitstring — bit-identical output.

    The pure-Column formulation is the readable/SQL-twinnable spec, but its
    64 filter+isin sub-expressions fall out of whole-stage codegen and cost
    ~24 ms/doc interpreted; this numpy path (one hashlib.md5 per token +
    unpackbits vote accumulation) is ~100× cheaper per doc and is what the
    dedup operator executes. Parity is pinned by
    test_dedup_ann.test_simhash_udf_column_parity.

    Parity notes: md5 of UTF-8 bytes on both sides; ASCII \\s+ tokenization
    (Java regex \\s is ASCII-only); leading/trailing-whitespace differences
    between Java trim and Python strip wash out because empty tokens are
    removed; null/empty text → all-zero bitstring on both sides."""
    import hashlib
    import re

    ws_re = re.compile(r"\s+", re.ASCII)
    zero = "0" * SIMHASH_BITS

    @F.pandas_udf("string")
    def _simhash64(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(zero)
                continue
            toks = [x for x in ws_re.split(t.strip().lower()) if x]
            n = len(toks)
            if n == 0:
                out.append(zero)
                continue
            acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
            for tok in toks:
                d = hashlib.md5(tok.encode("utf-8")).digest()[: SIMHASH_BITS // 8]
                acc += np.unpackbits(np.frombuffer(d, dtype=np.uint8))
            # +1 votes = acc, -1 votes = n - acc → bit set iff 2*acc >= n
            bits = 2 * acc >= n
            out.append("".join("1" if b else "0" for b in bits))
        return pd.Series(out)

    return _simhash64(text)


def hamming_bitstring(a: Column, b: Column, n_bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two equal-length bitstrings of n_bits chars.

    Computed as bit_count(xor) over 32-bit chunks parsed with conv(_, 2, 10)
    — pure JVM integer ops (a regex character-split + array zip was ~10×
    slower per pair and dominated the candidate-verify stage)."""
    total = None
    for start in range(1, n_bits + 1, 32):
        ln = min(32, n_bits - start + 1)
        ca = F.conv(F.substring(a, start, ln), 2, 10).cast("long")
        cb = F.conv(F.substring(b, start, ln), 2, 10).cast("long")
        term = F.bit_count(ca.bitwiseXOR(cb))
        total = term if total is None else total + term
    return total
