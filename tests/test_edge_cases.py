"""Degenerate-input robustness: empty transcripts, mention-free text,
single-entity corpus — the pipeline must produce empty/trivial outputs, not
crash (a 10^12-row job will contain empty partitions and pathological
conversations)."""

from __future__ import annotations

import pyspark.sql.functions as F

from metadata_reconciliation_tool_spark.schemas import TRANSCRIPTS


def test_empty_transcripts_full_pipeline(spark, bundle, tmp_path):
    from metadata_reconciliation_tool_spark.plans.pipeline import (
        ReconConfig,
        ReconPipeline,
    )

    empty = spark.createDataFrame([], TRANSCRIPTS)
    cfg = ReconConfig(job_id="empty", work_dir=str(tmp_path), force=True)
    out = ReconPipeline(spark, cfg).run(empty, bundle["dictionary"])
    assert out["entities"].count() == 0
    assert out["scores"].count() == 0
    assert out["clusters"].count() == 0
    assert out["best"].count() == 0


def test_mention_free_text(spark, bundle, tmp_path):
    from metadata_reconciliation_tool_spark.operators.extract import extract_entities

    rows = [("c0", 0, "user", "no triggers anywhere here", None, "2025-01-01 00:00:00")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    assert extract_entities(df).count() == 0


def test_connected_components_empty_and_singleton(spark):
    from metadata_reconciliation_tool_spark.operators.clustering import (
        assign_clusters,
        connected_components,
    )

    empty = spark.createDataFrame([], "left_key string, right_key string")
    comps = connected_components(empty)
    assert comps.count() == 0
    ents = spark.createDataFrame([("a",), ("b",)], "entity_key string")
    got = {r.entity_key: r.cluster_id for r in assign_clusters(ents, comps).collect()}
    assert got == {"a": "a", "b": "b"}  # singletons cluster as themselves


def test_connected_components_rounds_per_step_parity(spark):
    """rounds_per_step composes star rounds per materialization; the fixed
    point is step-size-independent (star rounds are monotone), so any step
    size must produce identical components. The parameter defaults to 1 —
    composition is a measured 2.4× dead end (PLANS.md #21) — but stays in
    the signature for re-measurement, so parity is pinned here: a chain, a
    triangle merging into it, an isolated pair, and a star."""
    from metadata_reconciliation_tool_spark.operators.clustering import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [
            ("b", "a"), ("c", "b"), ("d", "c"), ("e", "d"),  # chain → a
            ("f", "e"), ("g", "f"), ("g", "a"),              # triangle-ish merge
            ("y", "z"),                                       # isolated pair
            ("h", "m"), ("i", "m"), ("j", "m"),              # star → h
        ],
        "left_key string, right_key string",
    )
    base = sorted(map(tuple, connected_components(edges, rounds_per_step=1).collect()))
    assert base, "expected non-empty components"
    for rps in (2, 3):
        got = sorted(
            map(tuple, connected_components(edges, rounds_per_step=rps).collect())
        )
        assert got == base, f"rounds_per_step={rps} diverged"
