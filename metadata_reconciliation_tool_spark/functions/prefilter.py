"""Provably-sound upper bound on the token-aligned name similarity — the
scoring prefilter that keeps most candidate pairs away from the expensive
string kernels (round-2 verdict: scoring is 60% of pipeline wall and the
Python crossing is THE cost at 100 TB).

Contract: for token-sorted, normalized name strings ``ls``/``rs``,

    na_upper_bound_py(ls, rs)  >=  name_align_py(ls, rs)

always (fuzz-tested in tests/test_prefilter.py against the per-row kernel).
A pair whose best-possible composite score — the bound substituted for the
alignment kernel, every other composite input exact — falls below every
decision threshold skips the Jaro-Winkler/alignment kernels entirely.

Where the bound runs (an explicit engineering decision, measured): the
bound is evaluated INSIDE the one fused Arrow crossing (operators/
scoring.py), vectorized over the batch, not as a Catalyst expression. A
faithful Catalyst formulation needs token-nested higher-order functions
(transform/filter/aggregate with per-token char intersections), and Spark
evaluates HOF lambdas with the interpreted expression evaluator — measured
at ~20× the cost of the Python kernels it was meant to skip (65.7 s vs
3.5 s for 473k pairs at local[32]; see PLANS.md). The Python bound is ~7 µs
/pair vs ~34 µs for the kernels (4.7×), and the JVM still contributes what
it computes cheaply: the token-Levenshtein ratio, the F7 confidence, and
the source boost are Column expressions whose values are PASSED INTO the
UDF, so the prune decision uses exact JVM-computed components and the
kernels run only where the bound cannot refute a match.

Soundness argument, mirroring ``name_align_py`` (functions/similarity.py):

1. Titles are stripped on both sides (duplicates kept); ``small``/``big``
   are chosen exactly like the kernel (left wins ties). Empty sides → 0.0
   (exact, not a bound).
2. The kernel assigns strongest pairs first, so every token value present
   on both sides pairs exactly (1.0): an exact pair is only ever blocked by
   another exact pair using the same element, making the exact pairs formed
   a maximum matching among equal values. Hence a big token that occurs in
   small and exactly ONCE in big is certainly consumed by an exact pair and
   is excluded from the fuzzy candidates (``residual``); if big contains
   ANY duplicate value the exclusion is skipped entirely (a surplus copy
   may legally serve a fuzzy alignment — exclusion would be unsound).
3. Mean bound: with ``ns`` = len(small) (duplicates included) and
   ``small_nc`` = the DISTINCT small values absent from big, the numerator
   ``(ns - |small_nc|)·1.0 + Σ_{t∈small_nc} ub(t)`` dominates the true
   aligned sum: every small token whose value occurs in big is credited
   1.0 ≥ its true score; duplicated non-common values are credited 1.0 for
   every copy beyond the first and ub(t) once, and 1.0 ≥ ub(t) ≥ each
   copy's true score.
4. Per-token bound ub(t) = max over residual of a per-pair bound that is
   EXACT for the kernel's single-letter initials rule (0.95/0.0) and
   otherwise a Jaro-Winkler bound from (i) the char-multiset intersection —
   Jaro's match count m ≤ |distinct char ∩| + min(len−|distinct chars|)
   surplus repeats — and (ii) a distinctness bound 1−J ≥ max(|l1−l2|,1)/
   (3·lmax) (distinct equal-length strings force a missed match or a
   transposition), Winkler-scaled by the TRUE common prefix length.
5. The weakest-link factor is monotone nondecreasing in the weakest aligned
   score (both branches increase; the 0.9-boundary jump is upward), the
   weakest over ``small_nc`` bounds the true weakest from above (common
   values score 1.0; duplicates share their value's bound), and the
   extra-token penalty uses exact sizes — so plugging upper bounds into the
   formula yields an upper bound on the whole formula.

Reference anchor: the formulas being bounded replicate
reconciliation_engine.py:178-201 / wikidata_cultural_client.py:263-322
semantics; the alignment kernel itself is this engine's own (similarity.py).
"""

from __future__ import annotations

from .normalize import TITLE_WORDS

_TITLES = set(TITLE_WORDS)


# NOT memoized (round 4, measured): on the real 34M-pair bench
# distribution the (t, u) vocabulary seen by the BOUND is effectively
# unbounded — an lru_cache(2^18) measured a 69% miss rate and made the
# bound 33% SLOWER (thrash: insert+evict per miss). The kernel-side
# jaro_winkler_py IS memoized (similarity.py): only ~3.5% of pairs reach
# the kernels and their surviving token pairs repeat (60% hit, 3.6×).
def token_pair_upper_bound_py(t: str, u: str) -> float:
    """Upper bound on the alignment kernel's per-token ``pair_score(t, u)``
    (name_align_py). Exact 1.0 for equal tokens; exact 0.95/0.0 for the
    single-letter initials rule (which overrides Jaro-Winkler there); else
    the char-multiset/length Jaro-Winkler bound with true-prefix Winkler
    scaling (module docstring, point 4)."""
    if t == u:
        return 1.0
    lt, lu = len(t), len(u)
    if lt == 1 or lu == 1:
        return 0.95 if (u.startswith(t) or t.startswith(u)) else 0.0
    st, su = set(t), set(u)
    inter = len(st & su)
    if inter == 0:
        return 0.0
    m_ub = inter + min(lt - len(st), lu - len(su))
    j = min(
        (m_ub / lt + m_ub / lu + 1.0) / 3.0,
        1.0 - max(abs(lt - lu), 1) / (3.0 * max(lt, lu)),
    )
    if j <= 0.7:
        return j
    p = 0
    for k in range(min(4, lt, lu)):
        if t[k] != u[k]:
            break
        p += 1
    return 1.0 - (1.0 - j) * (1.0 - 0.1 * p)


def na_upper_bound_py(a: str, b: str) -> float:
    """Sound upper bound on ``name_align_py(a, b)`` (module docstring) for
    single-space-separated (token-sorted) name strings. ~7 µs/pair vs
    ~34 µs for the kernel pair — the asymmetry the prefilter exploits."""
    ta = [t for t in (a or "").split() if t not in _TITLES]
    tb = [t for t in (b or "").split() if t not in _TITLES]
    if not ta or not tb:
        return 0.0
    small, big = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
    sb = set(big)
    # soundness point 2: exclusion only safe when big has no duplicates
    if len(sb) == len(big):
        common = sb.intersection(small)
        residual = [u for u in big if u not in common]
    else:
        residual = big
    ns = len(small)
    small_nc = [t for t in dict.fromkeys(small) if t not in sb]
    exact_credit = ns - len(small_nc)
    if not small_nc:
        mean_ub, weakest = 1.0, 1.0
    else:
        ubs = []
        for t in small_nc:
            # No early exit: t is absent from big (t not in sb), so no
            # residual u equals t and no bound reaches a provable ceiling
            # of 1.0 — breaking on "close to 1" was unsound (a later u can
            # carry a strictly higher bound AND true score; see
            # test_prefilter.py long-token soundness cases).
            best = 0.0
            for u in residual:
                s = token_pair_upper_bound_py(t, u)
                if s > best:
                    best = s
            ubs.append(best)
        mean_ub = (exact_credit + sum(ubs)) / ns
        weakest = min(ubs)
    factor = 0.5 + 0.5 * weakest if weakest >= 0.9 else 0.9 * weakest * weakest
    extra = len(big) - len(small)
    return mean_ub * factor * max(0.0, 1.0 - 0.1 * extra)
