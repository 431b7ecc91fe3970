"""Multi-source dictionary wiring: Wikidata ∪ VIAF ∪ Getty union semantics,
per-(norm_label, source) A3 dedup, and the F9/F10 boosts applied in scoring
(reconciliation_engine.py:388-437; data_sources.py:260-292, 388-421)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _dic_row(auth_id, label, source, n_sources=None, term_type=None):
    return {
        "auth_id": auth_id,
        "label": label,
        "norm_label": label.lower(),
        "description": "a test entity",
        "entity_type": "person",
        "aliases": [label.upper()],
        "n_sources": n_sources,
        "external_ids": {},
        "source": source,
        "term_type": term_type,
    }


@pytest.fixture(scope="module")
def scored(spark):
    from metadata_reconciliation_tool_spark.operators.blocking import (
        add_block_keys,
        dictionary_candidates,
    )
    from metadata_reconciliation_tool_spark.operators.extract import prepare_dictionary
    from metadata_reconciliation_tool_spark.operators.scoring import score_pairs
    from metadata_reconciliation_tool_spark.schemas import DICTIONARY_MULTISOURCE

    import pandas as pd

    label = "rosedra ingolhill"
    dic = spark.createDataFrame(
        pd.DataFrame(
            [
                _dic_row("Q1", label, "wikidata"),
                _dic_row("V1", label, "viaf", n_sources=1),
                _dic_row("W1", label, "viaf", n_sources=9),  # A3 dup — must lose
                _dic_row("G1", label, "getty", term_type="preferred"),
                _dic_row("H1", "harriburg institute", "getty", term_type="alternate"),
            ]
        ),
        schema=DICTIONARY_MULTISOURCE,
    )
    ents = spark.createDataFrame(
        [
            ("e1", "rosedra ingolhil", "rosedra ingolhil", "person"),  # typo variant
            ("e2", "harriburg institute", "harriburg institute", "person"),
        ],
        ["entity_key", "name", "norm_name", "entity_type"],
    )
    pairs = dictionary_candidates(
        add_block_keys(ents), add_block_keys(prepare_dictionary(dic), "norm_label")
    )
    return {
        (r.left_key, r.right_key): r
        for r in score_pairs(pairs).collect()
    }


def test_a3_dedup_drops_duplicate_name_source(scored):
    rights = {rk for (_, rk) in scored}
    assert "V1" in rights and "W1" not in rights  # min auth_id wins per (name, source)


def test_viaf_boost_is_exactly_min_n_over_10(scored):
    base = scored[("e1", "Q1")].score
    viaf = scored[("e1", "V1")].score
    assert 0 < base < 0.9  # typo variant: below the cap region
    assert viaf - base == pytest.approx(min(1 / 10, 0.2), abs=1e-12)


def test_getty_preferred_boost_and_alternate_no_boost(scored):
    base = scored[("e1", "Q1")].score
    getty = scored[("e1", "G1")].score
    assert getty - base == pytest.approx(0.1, abs=1e-12)
    # exact-name match against an 'alternate' Getty term: hard 1.0, no boost
    assert scored[("e2", "H1")].score == 1.0


def test_viaf_outranks_equal_wikidata_in_best_match(spark, scored):
    from metadata_reconciliation_tool_spark.operators.ranking import best_match

    rows = spark.createDataFrame(
        [
            (k[0], k[1], float(r.score), r.confidence)
            for k, r in scored.items()
        ],
        ["left_key", "right_key", "score", "confidence"],
    )
    best = {r.left_key: r.right_key for r in best_match(rows).collect()}
    # G1 (preferred, +0.1) > V1 (+0.1 with lower tie-break? no: same +0.1) —
    # getty and viaf boosts are equal here, so the winner is the higher
    # score; assert the boosted sources beat the unboosted wikidata row
    assert best["e1"] in {"V1", "G1"}


def test_full_pipeline_with_multisource_dictionary(spark, tmp_path):
    """End-to-end: the pipeline accepts a multi-source dictionary and the
    best-match stage reflects source boosts."""
    from metadata_reconciliation_tool_spark.fixtures import (
        build_variants,
        entity_pool,
        gen_multisource_dictionary,
        gen_transcripts,
    )
    from metadata_reconciliation_tool_spark.plans.pipeline import (
        ReconConfig,
        ReconPipeline,
    )

    pool = entity_pool(20)
    dic = gen_multisource_dictionary(spark, pool)
    t = gen_transcripts(spark, build_variants(pool), n_convs=40, turns_per_conv=8)
    cfg = ReconConfig(
        job_id="ms", work_dir=str(tmp_path), force=True, collect_metrics=False
    )
    out = ReconPipeline(spark, cfg).run(t, dic)
    best = out["best"].filter(F.col("right_key").isNotNull())
    assert best.count() > 0
    # every matched auth id is a surviving (non-A3-duplicate) dictionary row
    matched = {r.right_key for r in best.collect()}
    assert not any(a.startswith("W") for a in matched)
