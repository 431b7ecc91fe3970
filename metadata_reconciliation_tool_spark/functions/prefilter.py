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
3.5 s for 473k pairs at local[32]; see PLANS.md). Since round 5 the bound
runs through :func:`make_na_upper_bound_vectorized` — a batch-flattened
numpy sweep measured ~2× the scalar loop on the real 34M-pair bench
distribution (~4 µs vs ~8 µs/pair; the scalar :func:`na_upper_bound_py`
stays as the executable spec and parity twin). The JVM still contributes
what it computes cheaply: the token-Levenshtein ratio, the F7 confidence,
and the source boost are Column expressions whose values are PASSED INTO
the UDF, so the prune decision uses exact JVM-computed components and the
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


def make_na_upper_bound_vectorized():
    """Vectorized per-batch evaluator: computes EXACTLY ``na_upper_bound_py``
    over a whole Arrow batch of pairs at once (bit-parity fuzz-pinned in
    tests/test_prefilter.py), replacing the per-pair scalar bound that
    profiling put at ~8 µs/pair — ~37% of the engine's TOTAL parallel
    cpu·s at sf0.1 (the single largest component; BENCH.md round 5).

    Structure (two phases per batch):

    1. a Python pass over the pairs builds the alignment STRUCTURE —
       per-name filtered-token lists, the small/big assignment, the
       common-token exclusion, and a flat (token, candidate) combo table —
       through per-batch name/token memo dicts (names and tokens recur
       across a batch's pairs by block-locality: blocking emits one pair
       row per candidate, so each entity's name recurs across all its
       candidates and a block's pairs land in the same shuffle partition);
    2. numpy evaluates every combo's token bound in one vectorized sweep:
       the Jaro match-count ceiling ``|set(t) ∩ set(u)|`` becomes a
       popcount over 63-bit char masks (the char→bit map is built per
       evaluator and INJECTIVE by construction — a 64th distinct character
       routes its tokens through the exact scalar fallback, so collisions
       can never loosen or tighten the bound), the Winkler prefix length
       becomes four padded char-code column compares, and the per-token /
       per-pair max-mean-min reductions run as ``ufunc.reduceat`` over the
       pair-ordered flat table (segments are ≤ tokens-per-name, far below
       numpy's pairwise-summation block, so float addition order matches
       the scalar left-to-right ``sum``).

    Float parity notes: every arithmetic expression keeps the scalar
    code's operation order, all in float64 — elementwise numpy IEEE ops
    are bit-identical to CPython's. ``t == u`` combos are unreachable
    (every t ∈ small_nc has t ∉ set(big) while candidates come from big),
    and a residual with duplicate tokens is deduplicated before the max —
    a pure speed change, the max is value-identical.
    """
    import numpy as np

    titles = _TITLES
    char_bits: dict[str, int] = {}

    # token arrays, grown append-only; index = token id
    tok_ids: dict[str, int] = {}
    tok_strs: list[str] = []
    t_len: list[int] = []
    t_dlen: list[int] = []  # len(set(t))
    t_mask: list[int] = []
    t_ovf: list[bool] = []  # True → token has a char beyond the 63-bit map
    t_c4: list[tuple[int, int, int, int]] = []  # first 4 char codes, pad -1
    name_info: dict[str, tuple] = {}

    def tok_id(t: str) -> int:
        tid = tok_ids.get(t)
        if tid is None:
            tid = len(tok_strs)
            tok_ids[t] = tid
            tok_strs.append(t)
            st = set(t)
            mask = 0
            ovf = False
            for c in st:
                bit = char_bits.get(c)
                if bit is None:
                    bit = len(char_bits)
                    char_bits[c] = bit
                if bit >= 63:
                    ovf = True
                else:
                    mask |= 1 << bit
            t_len.append(len(t))
            t_dlen.append(len(st))
            t_mask.append(mask)
            t_ovf.append(ovf)
            cs = [ord(c) for c in t[:4]]
            t_c4.append(tuple(cs + [-1] * (4 - len(cs))))
        return tid

    def prep_name(name: str) -> tuple:
        info = name_info.get(name)
        if info is None:
            tids = [tok_id(t) for t in name.split() if t not in titles]
            tset = set(tids)
            info = (tids, tset, tuple(dict.fromkeys(tids)))
            name_info[name] = info
        return info

    def evaluate(names1: list, names2: list) -> "np.ndarray":
        n = len(names1)
        out = np.empty(n, dtype=np.float64)
        # flat combo table + segment offsets
        combo_t: list[int] = []  # token id of the small_nc token
        combo_u: list[int] = []  # token id of the residual candidate
        tok_seg: list[int] = []  # combo-start offset per small_nc token
        pair_idx: list[int] = []  # row index of each structured pair
        pair_ns: list[int] = []
        pair_nc: list[int] = []  # len(small_nc)
        pair_extra: list[int] = []
        for i in range(n):
            ta, sa, da = prep_name(names1[i] or "")
            tb, sb, db = prep_name(names2[i] or "")
            if not ta or not tb:
                out[i] = 0.0
                continue
            if len(ta) <= len(tb):
                s_small, d_small, big, s_big, d_big = sa, da, tb, sb, db
                ns, nb = len(ta), len(tb)
            else:
                s_small, d_small, big, s_big, d_big = sb, db, ta, sa, da
                ns, nb = len(tb), len(ta)
            small_nc = [t for t in d_small if t not in s_big]
            extra = nb - ns
            if not small_nc:
                # mean_ub = weakest = 1.0 → factor = 1.0 exactly
                out[i] = 1.0 * max(0.0, 1.0 - 0.1 * extra)
                continue
            if len(s_big) == len(big):
                # no duplicates in big → common values are provably
                # consumed by exact pairs; u ∈ big is common iff its value
                # appears in small
                residual = [u for u in d_big if u not in s_small]
            else:
                residual = d_big  # tuple reused as-is — no per-pair copy
            pair_idx.append(i)
            pair_ns.append(ns)
            pair_nc.append(len(small_nc))
            pair_extra.append(extra)
            for t in small_nc:
                tok_seg.append(len(combo_t))
                combo_t.extend([t] * len(residual))
                combo_u.extend(residual)
        if not pair_idx:
            return out

        ct = np.asarray(combo_t, dtype=np.int64)
        cu = np.asarray(combo_u, dtype=np.int64)
        lt = np.asarray(t_len, dtype=np.int64)
        dl = np.asarray(t_dlen, dtype=np.int64)
        mk = np.asarray(t_mask, dtype=np.uint64)
        c4 = np.asarray(t_c4, dtype=np.int64)
        lt_t, lt_u = lt[ct], lt[cu]
        # --- inline token_pair_upper_bound_py, vectorized -----------------
        inter_bits = mk[ct] & mk[cu]
        inter = _popcount64(inter_bits)
        m_ub = inter + np.minimum(lt_t - dl[ct], lt_u - dl[cu])
        j = np.minimum(
            (m_ub / lt_t + m_ub / lt_u + 1.0) / 3.0,
            1.0
            - np.maximum(np.abs(lt_t - lt_u), 1) / (3.0 * np.maximum(lt_t, lt_u)),
        )
        c4t, c4u = c4[ct], c4[cu]
        eq = c4t == c4u
        # common prefix = leading run of equal real chars; pads are -1 on
        # both sides, but a pad-pad "match" can only start at position
        # min(lt, lu) — the clamp below removes it exactly. The leading-run
        # length is a boolean AND-chain (round 6: ~2× cheaper than the
        # former int64 cumprod over the combo table, same values).
        run = eq[:, 0].copy()
        prefix_len = run.astype(np.int64)
        for col in range(1, 4):
            run &= eq[:, col]
            prefix_len += run
        p = np.minimum(np.minimum(prefix_len, 4), np.minimum(lt_t, lt_u))
        w = 1.0 - (1.0 - j) * (1.0 - 0.1 * p)
        s = np.where(j <= 0.7, j, w)
        s = np.where(inter == 0, 0.0, s)
        single = (lt_t == 1) | (lt_u == 1)
        if single.any():
            first_eq = c4t[:, 0] == c4u[:, 0]
            s = np.where(single, np.where(first_eq, 0.95, 0.0), s)
        ovf = np.asarray(t_ovf, dtype=bool)
        bad = ovf[ct] | ovf[cu]
        if bad.any():
            # exact scalar fallback for tokens whose chars overflowed the
            # 63-bit map — popcount would otherwise UNDERcount the char
            # intersection (unsound)
            for k in np.flatnonzero(bad):
                s[k] = token_pair_upper_bound_py(tok_strs[ct[k]], tok_strs[cu[k]])
        # --- per-token max over residual, then per-pair mean/weakest ------
        tok_off = np.asarray(tok_seg, dtype=np.int64)
        ubs = np.maximum.reduceat(s, tok_off)  # max: order-independent
        # per-pair sum/min in a scalar loop: np.add.reduceat's partial-sum
        # order differs from Python's left-to-right sum() even on 3-element
        # segments (measured: last-ULP drift on ~1% of pairs) and pruned
        # rows emit the bound verbatim — exact addition order is part of
        # the parity contract. Segments average ~1 token, the loop is
        # noise next to the combo sweep above.
        npair = len(pair_idx)
        sum_ubs = np.empty(npair, dtype=np.float64)
        weakest = np.empty(npair, dtype=np.float64)
        ub_list = ubs.tolist()
        pos = 0
        for k in range(npair):
            cnt = pair_nc[k]
            acc = 0.0
            w = ub_list[pos]
            for j in range(pos, pos + cnt):
                v = ub_list[j]
                acc += v
                if v < w:
                    w = v
            sum_ubs[k] = acc
            weakest[k] = w
            pos += cnt
        ns_v = np.asarray(pair_ns, dtype=np.int64)
        nc_v = np.asarray(pair_nc, dtype=np.int64)
        mean_ub = ((ns_v - nc_v) + sum_ubs) / ns_v
        factor = np.where(
            weakest >= 0.9, 0.5 + 0.5 * weakest, 0.9 * weakest * weakest
        )
        extra_v = np.asarray(pair_extra, dtype=np.int64)
        out[np.asarray(pair_idx, dtype=np.int64)] = (
            mean_ub * factor * np.maximum(0.0, 1.0 - 0.1 * extra_v)
        )
        return out

    evaluate.n_names = lambda: len(name_info)
    return evaluate


# Worker-cached evaluator (round 6, measured): the scoring UDF used to
# build a FRESH evaluator per Arrow batch, re-tokenizing every name from
# scratch — but names recur across batches too (an entity's name appears
# once per candidate pair, and a reused Python worker processes many
# batches). Caching the evaluator per worker process carries the
# name/token memos across batches; values are unchanged (the memo is a
# pure cache of per-name structure). The memo is reset when it exceeds
# ``_EVAL_MAX_NAMES`` distinct names, keeping worker memory bounded — the
# same bounded-cache policy as similarity.jaro_winkler_py's LRU.
_EVAL = None
_EVAL_PID: int | None = None
_EVAL_MAX_NAMES = 2_000_000


def get_na_upper_bound_evaluator():
    """The per-worker cached :func:`make_na_upper_bound_vectorized`
    instance (PID-guarded: a forked worker never inherits a parent's memo
    mid-structure)."""
    global _EVAL, _EVAL_PID
    import os

    pid = os.getpid()
    if _EVAL is None or _EVAL_PID != pid or _EVAL.n_names() > _EVAL_MAX_NAMES:
        _EVAL = make_na_upper_bound_vectorized()
        _EVAL_PID = pid
    return _EVAL


def _popcount64(x):
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    import numpy as np

    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    b = x.view(np.uint8).reshape(len(x), 8)
    # uint8 lookup table (round 6): the gather touches 8× fewer bytes than
    # the former int64 table; the int64 accumulator keeps values identical
    return _POP8[b].sum(axis=1, dtype=np.int64)


try:  # byte-popcount table, built once at import
    import numpy as _np

    _POP8 = _np.array([bin(i).count("1") for i in range(256)], dtype=_np.uint8)
except Exception:  # pragma: no cover - numpy is a hard dependency of pyspark
    _POP8 = None


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
