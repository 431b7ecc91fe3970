"""Training-data operator checks: dedup suite, similarity search,
multimodal plumbing — on tiny planted inputs plus sf0.001 testdata."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog", "en", "s0"),
            (1, "the quick brown fox jumps over the lazy dog", "en", "s0"),  # exact dup
            (2, "the quick brown fox jumped over the lazy dog", "en", "s0"),  # near dup
            (3, "lazy the dog quick brown fox jumps over the", "en", "s0"),  # reordered
            (4, "completely different content about spark engines", "en", "s0"),
            (5, "absolument rien a voir avec le reste du corpus", "fr", "s0"),
        ],
        ["doc_id", "text", "lang", "source"],
    )


def test_exact_dedup_keeps_min_id(docs):
    from metadata_reconciliation_tool_spark.operators.dedup import exact_dedup

    ids = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert ids == [0, 2, 3, 4, 5]  # doc 1 removed (dup of 0)


def test_fingerprint_dedup_collapses_reorder(docs):
    from metadata_reconciliation_tool_spark.operators.dedup import fingerprint_dedup

    ids = sorted(r.doc_id for r in fingerprint_dedup(docs).collect())
    # doc 3 is a token-reorder of doc 0's token set → collapsed
    assert 3 not in ids and 0 in ids


def test_exact_dedup_null_text_keeps_one(spark):
    """Null-text rows form one dedup group (sentinel key) — an equi-join on
    the raw md5 key would silently drop them all (null ≠ null)."""
    from metadata_reconciliation_tool_spark.operators.dedup import exact_dedup

    d = spark.createDataFrame(
        [(0, None), (1, None), (2, "real text")],
        ["doc_id", "text"],
    )
    ids = sorted(r.doc_id for r in exact_dedup(d).collect())
    assert ids == [0, 2]


def test_minhash_finds_planted_near_dup(docs):
    from metadata_reconciliation_tool_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r.left_id, r.right_id) for r in minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs  # exact dup
    assert (0, 2) in pairs  # 1-word edit
    assert not any(5 in p for p in pairs)  # the french doc matches nothing


def test_minhash_oversized_bucket_star_linked(spark):
    """A mega-dup cluster larger than max_block_size must produce O(n) star
    pairs against the min-id representative — never the C(n,2) within-bucket
    blow-up — while keeping every member connected for downstream CC."""
    from metadata_reconciliation_tool_spark.operators.clustering import (
        connected_components,
    )
    from metadata_reconciliation_tool_spark.operators.dedup import minhash_lsh_pairs

    n = 40
    rows = [(i, "same boilerplate text repeated everywhere", "en", "s0") for i in range(n)]
    rows.append((n, "an unrelated document about something else entirely", "en", "s0"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])

    pairs = minhash_lsh_pairs(docs, max_block_size=10)
    got = {(r.left_id, r.right_id) for r in pairs.collect()}
    # star: exactly n-1 pairs, all anchored at the min id
    assert got == {(0, i) for i in range(1, n)}
    # connectivity preserved: one component containing all n members
    edges = pairs.select(
        F.col("left_id").cast("string").alias("left_key"),
        F.col("right_id").cast("string").alias("right_key"),
    )
    comp = connected_components(edges)
    assert {r.cluster_id for r in comp.collect()} == {"0"}
    # below the cap the same input produces all C(n,2) pairs
    full = minhash_lsh_pairs(docs, max_block_size=1000)
    assert full.count() == n * (n - 1) // 2


def test_embedding_dedup_drops_oversized_cell(spark):
    """An IVF cell above max_block_size is dropped AND reported (not
    star-linked — cell members need not be mutually similar), while cells
    below the cap still produce their pairs."""
    from metadata_reconciliation_tool_spark.operators.dedup import embedding_dup_pairs

    hot = [(i, [1.0, 0.0], "hot") for i in range(8)]
    cold = [(100, [0.0, 1.0], "cold"), (101, [0.0, 1.0], "cold")]
    emb = spark.createDataFrame(hot + cold, ["vec_id", "embedding", "label"])

    pairs, dropped = embedding_dup_pairs(emb, max_block_size=5, return_dropped=True)
    d = {r.bk: r.block_n for r in dropped.collect()}
    assert d == {"hot": 8}
    got = {(r.left_id, r.right_id) for r in pairs.collect()}
    assert got == {(100, 101)}


def test_simhash_oversized_bucket_star_linked(spark):
    """Identical-text docs share every quarter key; above max_block_size the
    bucket must star-link to the min id (O(n) hamming-0 pairs), not emit
    C(n,2)."""
    from metadata_reconciliation_tool_spark.operators.dedup import simhash_dedup_pairs

    n = 30
    rows = [(i, "boilerplate text shared by every mirror of this page", "en", "s0") for i in range(n)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])

    got = {(r.left_id, r.right_id): r.hamming for r in simhash_dedup_pairs(docs, max_block_size=10).collect()}
    assert got == {(0, i): 0 for i in range(1, n)}
    full = simhash_dedup_pairs(docs, max_block_size=1000)
    assert full.count() == n * (n - 1) // 2


def test_simhash_hamming_bounds(docs):
    from metadata_reconciliation_tool_spark.operators.dedup import simhash_dedup_pairs

    rows = simhash_dedup_pairs(docs).collect()
    got = {(r.left_id, r.right_id): r.hamming for r in rows}
    assert got.get((0, 1)) == 0  # identical text → identical simhash
    assert all(h <= 3 for h in got.values())


def test_simhash_candidate_generation_exact(docs):
    """4×16-bit quarter blocking must find EVERY pair with Hamming ≤ 3
    (pigeonhole) — compare against brute-force all-pairs on the fixture."""
    from metadata_reconciliation_tool_spark.functions.textstats import (
        hamming_bitstring,
        simhash_bitstring,
    )
    from metadata_reconciliation_tool_spark.operators.dedup import simhash_dedup_pairs

    keyed = docs.select("doc_id", simhash_bitstring(F.col("text")).alias("sh"))
    l = keyed.select(F.col("doc_id").alias("left_id"), F.col("sh").alias("lsh"))
    r = keyed.select(F.col("doc_id").alias("right_id"), F.col("sh").alias("rsh"))
    brute = (
        l.crossJoin(r)
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("hamming", hamming_bitstring(F.col("lsh"), F.col("rsh")))
        .filter(F.col("hamming") <= 3)
    )
    expect = {(x.left_id, x.right_id, x.hamming) for x in brute.collect()}
    got = {(x.left_id, x.right_id, x.hamming) for x in simhash_dedup_pairs(docs).collect()}
    assert got == expect


def test_simhash_udf_column_parity(spark, docs):
    """The vectorized UDF execution path must be bit-identical to the
    Column-expression spec (which the DuckDB oracle mirrors) — including
    null/empty/whitespace-only text edge cases."""
    from metadata_reconciliation_tool_spark.functions.textstats import (
        simhash_bitstring,
        simhash_bitstring_udf,
    )

    edge = spark.createDataFrame(
        [(100, None), (101, ""), (102, "   \t \n "), (103, "  padded  text ")],
        ["doc_id", "text"],
    )
    sf_docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    for df in (docs.select("doc_id", "text"), edge, sf_docs):
        cmp = df.select(
            simhash_bitstring(F.col("text")).alias("a"),
            simhash_bitstring_udf(F.col("text")).alias("b"),
        )
        assert cmp.filter("a <> b OR a IS NULL OR b IS NULL").count() == 0


def test_simhash_max_hamming_guard(docs):
    import pytest as _pytest

    from metadata_reconciliation_tool_spark.operators.dedup import simhash_dedup_pairs

    with _pytest.raises(ValueError):
        simhash_dedup_pairs(docs, max_hamming=4)


def test_ngram_jaccard_scores(docs):
    from metadata_reconciliation_tool_spark.operators.dedup import ngram_jaccard_pairs

    rows = {
        (r.left_id, r.right_id): r.ngram_jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert rows[(0, 1)] == 1.0
    # one word edited in 9 tokens touches 3 of 7 shingles → 4/10 = 0.4
    assert rows[(0, 2)] == 0.4
    assert (0, 4) not in rows


def test_brute_force_topk_sanity(spark):
    from metadata_reconciliation_tool_spark.operators.similarity_search import (
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = brute_force_topk(emb.filter("vec_id < 5"), emb, k=3)
    rows = out.collect()
    assert len(rows) == 15  # 5 queries × 3
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.query_id != r.neighbor_id
        assert -1.0 <= r.cosine <= 1.0
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == [1, 2, 3]
        sims = [r.cosine for r in sorted(rs, key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True)


def test_srp_lsh_recall_vs_brute_force(spark):
    from metadata_reconciliation_tool_spark.operators.similarity_search import (
        brute_force_topk,
        srp_lsh_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(q, emb, k=5).collect()}
    # these embeddings' true neighbors are weak (max cosine ≈ 0.47), so the
    # bucket probability per plane is near-coin-flip: use short codes and
    # more tables (at real scale, high-cosine dup detection uses longer codes)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in srp_lsh_topk(q, emb, k=5, n_planes=4, n_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"SRP-LSH recall {recall}"


def test_srp_planes_scale_with_corpus():
    from metadata_reconciliation_tool_spark.operators.similarity_search import (
        derive_n_planes,
    )

    assert derive_n_planes(500) == 8            # small corpus → floor
    assert derive_n_planes(256 * 2**8) == 8     # exactly at the floor
    assert derive_n_planes(10**9) == 22         # 2^22 buckets ≈ 4M → ~256/bucket
    assert derive_n_planes(10**12) == 32
    assert derive_n_planes(0) == 8              # degenerate corpus


def test_ngram_jaccard_drops_oversized_blocks(spark):
    """A pathological megadup block (identical boilerplate) must be dropped
    at max_block_size and reported — never fed to the all-pairs join."""
    from metadata_reconciliation_tool_spark.operators.dedup import ngram_jaccard_pairs

    boiler = [(i, "exact same boilerplate text repeated in every document here", "en", "s")
              for i in range(50)]
    normal = [(100, "a unique document about spark adaptive execution", "en", "s"),
              (101, "a unique document about spark adaptive execution", "en", "s")]
    docs = spark.createDataFrame(boiler + normal, ["doc_id", "text", "lang", "source"])
    pairs, dropped = ngram_jaccard_pairs(docs, max_block_size=10, return_dropped=True)
    got = {(r.left_id, r.right_id) for r in pairs.collect()}
    drop_rows = dropped.collect()
    assert (100, 101) in got                      # small block still compared
    assert not any(l < 50 and r < 50 for l, r in got)  # megadup block dropped
    assert len(drop_rows) >= 1 and all(r.block_n == 50 for r in drop_rows)


def test_multimodal_plumbing(spark):
    from metadata_reconciliation_tool_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        gen_media,
    )

    media = gen_media(spark, 32)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        assert len(r.content_hash) == 64
    # determinism: rerun gives identical features
    again = {r.media_id: r.feature for r in extract_features(media).collect()}
    for r in rows:
        assert again[r.media_id] == r.feature


def test_wav_roundtrip_decode_matches_formula(spark):
    """Encode→decode round-trip: real RIFF/WAV files parsed with the stdlib
    must reproduce the generating formula's stats exactly."""
    import numpy as np

    from metadata_reconciliation_tool_spark.operators.multimodal import (
        WAV_RATE,
        decode_wav_features,
        decode_wav_py,
        gen_wav_media,
        wav_bytes_py,
        wav_samples_py,
    )

    # pure-python pin first (no Spark): formula → bytes → decode
    m, n = 7, 960
    feats = decode_wav_py(wav_bytes_py(m, n))
    x = wav_samples_py(m, n).astype(np.int64)
    assert feats["n_channels"] == 1 and feats["sample_rate"] == WAV_RATE
    assert feats["n_samples"] == n
    assert feats["peak"] == int(np.max(np.abs(x)))
    assert feats["zero_crossings"] == int(np.sum(x[:-1] * x[1:] < 0))
    assert feats["rms"] == float(np.sqrt(int(np.sum(x * x)) / n))

    # distributed path: variable-length payloads, one row per input
    rows = decode_wav_features(gen_wav_media(spark, 16)).collect()
    assert len(rows) == 16
    assert {r.n_samples for r in rows} == {800, 960, 1120, 1280, 1440}


def test_multimodal_strict_mode_raises(spark):
    from metadata_reconciliation_tool_spark.operators.multimodal import (
        extract_features,
        gen_media,
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        extract_features(gen_media(spark, 4), strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_srp_lsh_hot_bucket_capped(spark):
    """Round-2 verdict item 3: a duplicate-heavy corpus (10^4 identical
    vectors → one bucket per table) must NOT go quadratic in the bucket
    join — corpus rows per bucket are capped at max_bucket_size (lowest
    ids), over-cap buckets are reported, and queries still get their k
    identical-vector neighbors."""
    from metadata_reconciliation_tool_spark.operators.similarity_search import (
        srp_lsh_topk,
    )

    n_hot = 10_000
    hot = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n_hot)]
    cold = [(n_hot + j, [float(j + 1), -1.0, 0.5, -2.0]) for j in range(20)]
    emb = spark.createDataFrame(hot + cold, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id").isin(0, 1, n_hot))

    cap = 50
    topk, dropped = srp_lsh_topk(
        q, emb, k=5, dim=4, n_planes=4, n_tables=2,
        max_bucket_size=cap, return_dropped=True,
    )
    drops = dropped.collect()
    assert len(drops) > 0  # the hot bucket is reported
    assert all(r.bucket_n > cap and r.n_dropped == r.bucket_n - cap for r in drops)

    rows = topk.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # hot queries: k neighbors, all perfect-cosine duplicates from the
    # retained (lowest-id) bucket members
    for qid in (0, 1):
        neigh = by_q[qid]
        assert len(neigh) == 5
        assert all(abs(r.cosine - 1.0) < 1e-9 for r in neigh)
        assert all(r.neighbor_id < cap for r in neigh)
    # candidate volume is bounded: every emitted neighbor of any query came
    # from a capped bucket → neighbor ids of hot-bucket queries stay under
    # n_tables × cap distinct corpus rows
    assert {r.neighbor_id for r in rows if r.query_id in (0, 1)} <= set(range(cap))


def test_srp_lsh_cap_noop_below_cap(spark):
    """With buckets under the cap the capped operator is identical to the
    uncapped round-2 behavior (oracle-parity guard)."""
    from metadata_reconciliation_tool_spark.operators.similarity_search import (
        srp_lsh_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    capped = srp_lsh_topk(q, emb, k=5, n_planes=8).collect()
    uncapped = srp_lsh_topk(q, emb, k=5, n_planes=8, max_bucket_size=1 << 30).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))


def test_srp_cap_hot_bucket_no_single_task_sort(spark):
    """Round-3 verdict item 3: the cap selection must never sort a hot
    bucket's full population in one task. With a 10^4-identical-vector
    bucket, the rank windows partition by (bk, salt) — this test replays
    the exact salt assignment and asserts every window partition (= one
    task's input) is bounded by max(~n/s, s*cap), far below n; and that
    the retained set equals the naive single-window lowest-ids selection."""
    from pyspark.sql import Window

    from metadata_reconciliation_tool_spark.operators.similarity_search import (
        _cap_buckets,
    )

    n_hot = 10_000
    cap, cap_salts = 64, 64
    rows = [(i, "hot") for i in range(n_hot)] + [
        (n_hot + j, f"cold{j % 7}") for j in range(200)
    ]
    ck = spark.createDataFrame(rows, ["neighbor_id", "bk"]).withColumn(
        "cv", F.array(F.lit(1.0))
    )

    capped, dropped = _cap_buckets(ck, cap, cap_salts)

    # exact parity with the naive single-window lowest-ids selection
    w = Window.partitionBy("bk").orderBy(F.asc("neighbor_id"))
    naive = (
        ck.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    got = sorted((r.bk, r.neighbor_id) for r in capped.collect())
    want = sorted((r.bk, r.neighbor_id) for r in naive.collect())
    assert got == want

    d = {r.bk: (r.bucket_n, r.n_dropped) for r in dropped.collect()}
    assert d == {"hot": (n_hot, n_hot - cap)}

    # boundedness: replay the salt assignment on the over-cap bucket and
    # measure the stage-1 window partition sizes (one rank task's input)
    s = min(-(-n_hot // cap), cap_salts)  # ceil
    stage1 = (
        ck.filter(F.col("bk") == "hot")
        .withColumn(
            "_salt", F.pmod(F.xxhash64("neighbor_id"), F.lit(s)).cast("int")
        )
        .groupBy("bk", "_salt")
        .count()
        .collect()
    )
    assert len(stage1) == s  # the hot bucket genuinely fans out across salts
    hottest = max(r["count"] for r in stage1)
    assert hottest <= 4 * (n_hot // s), f"one salt holds {hottest} rows"
    assert hottest < n_hot / 8  # nothing remotely like the full bucket
    # stage 2's single-bucket input is the survivors: <= s*cap rows
    assert s * cap < n_hot  # the bound is a real improvement at this shape


def test_y4m_roundtrip_decode_matches_formula(spark):
    """Encode→decode round-trip for the video kind (round-3 verdict item
    5): real YUV4MPEG2 streams parsed with the stdlib must reproduce the
    generating formula's per-frame stats exactly — one row per decoded
    frame (real frame sampling), variable dims/frame counts per id."""
    from metadata_reconciliation_tool_spark.operators.multimodal import (
        decode_y4m_frames,
        decode_y4m_py,
        gen_y4m_media,
        y4m_bytes_py,
        y4m_dims_py,
        y4m_n_frames_py,
        y4m_sample_py,
    )

    # pure-python pin (no Spark): formula -> bytes -> decode, all planes
    for m in (0, 4, 10):  # covers every (w, h, nf) variant incl. W10
        w, h = y4m_dims_py(m)
        frames = decode_y4m_py(y4m_bytes_py(m))
        assert len(frames) == y4m_n_frames_py(m)
        for fr in frames:
            assert (fr["width"], fr["height"]) == (w, h)
            for plane, col in ((0, "mean_y"), (1, "mean_cb"), (2, "mean_cr")):
                want = sum(
                    y4m_sample_py(m, fr["frame_idx"], plane, y, x)
                    for y in range(h)
                    for x in range(w)
                ) / (w * h)
                assert fr[col] == want

    # malformed inputs are rejected, not misparsed
    with pytest.raises(ValueError):
        decode_y4m_py(b"RIFF....")
    with pytest.raises(ValueError):
        decode_y4m_py(b"YUV4MPEG2 W4 H4 F25:1 C422\n")  # unsupported C

    # distributed path: one row per frame, frame counts follow the formula
    rows = decode_y4m_frames(gen_y4m_media(spark, 12)).collect()
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(per_media) == set(range(12))
    for mid, idxs in per_media.items():
        assert sorted(idxs) == list(range(y4m_n_frames_py(mid)))


def test_extract_features_stub_values_and_frame_plan(spark):
    """The two registry queries retired in round 4 (multimodal_features,
    multimodal_frame_sample) stay value-checked here: the sha256-derived
    stub features and the frame-index explosion are recomputed locally and
    compared row by row."""
    import hashlib

    import numpy as np

    from metadata_reconciliation_tool_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample_plan,
        gen_media,
    )

    media_rows = {r.media_id: r for r in gen_media(spark, 24).collect()}
    feats = extract_features(gen_media(spark, 24)).collect()
    assert len(feats) == 24
    for r in feats:
        payload = bytes(media_rows[r.media_id].payload)
        assert r.content_hash == hashlib.sha256(payload).hexdigest()
        assert r.n_bytes == len(payload)
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(
            (digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
            dtype=np.uint32,
        )
        want = ((raw % 1000).astype(np.float32) / 1000.0).tolist()
        assert [round(v, 6) for v in r.feature] == [round(v, 6) for v in want]

    sampled = frame_sample_plan(gen_media(spark, 24), every_n=10).collect()
    got = {}
    for r in sampled:
        got.setdefault(r.media_id, []).append(r.frame_idx)
    for mid, idxs in got.items():
        n_frames = len(bytes(media_rows[mid].payload)) // 8
        assert media_rows[mid].kind == "video"
        assert sorted(idxs) == list(range(0, n_frames + 1, 10))
    assert set(got) == {m for m, r in media_rows.items() if r.kind == "video"}


def test_y4m_c420_decode():
    """The decoder also handles the spec-default C420 family: quarter-res
    chroma planes, header-default colorspace (no C token), odd-dims
    rejection. Pure python — no Spark needed."""
    from metadata_reconciliation_tool_spark.operators.multimodal import (
        decode_y4m_py,
    )

    w, h = 4, 2
    yp = list(range(w * h))                  # 0..7  -> mean 3.5
    cb = [10, 20]                            # (w/2)*(h/2) = 2 -> mean 15
    cr = [30, 250]                           # mean 140, peak 250
    body = bytes(yp) + bytes(cb) + bytes(cr)
    for hdr in (b"YUV4MPEG2 W4 H2 F25:1 C420jpeg\n",
                b"YUV4MPEG2 W4 H2 F25:1\n"):  # no C token -> C420jpeg default
        frames = decode_y4m_py(hdr + b"FRAME\n" + body + b"FRAME\n" + body)
        assert len(frames) == 2
        for fr in frames:
            assert (fr["width"], fr["height"]) == (4, 2)
            assert fr["mean_y"] == 3.5
            assert fr["mean_cb"] == 15.0
            assert fr["mean_cr"] == 140.0
            assert fr["peak"] == 250

    import pytest as _pytest

    with _pytest.raises(ValueError, match="even dims"):
        decode_y4m_py(b"YUV4MPEG2 W5 H2 F25:1 C420\n")
