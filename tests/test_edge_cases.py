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
    base = sorted(
        map(
            tuple,
            connected_components(
                edges, rounds_per_step=1, local_finish_max_edges=0
            ).collect(),
        )
    )
    assert base, "expected non-empty components"
    for rps in (2, 3):
        got = sorted(
            map(
                tuple,
                connected_components(
                    edges, rounds_per_step=rps, local_finish_max_edges=0
                ).collect(),
            )
        )
        assert got == base, f"rounds_per_step={rps} diverged"


def test_connected_components_local_finish_parity(spark):
    """The size-gated driver union-find (round 5) must be value-identical
    to the pure-distributed star rounds on every path: entry-gate trigger
    (edges ≤ gate up front), IN-LOOP trigger (graph contracts below the
    gate after a distributed round), and disabled (gate=0). Random
    multi-component graphs with long chains exercise deep contraction."""
    import random

    from metadata_reconciliation_tool_spark.operators.clustering import (
        connected_components,
    )

    rng = random.Random(17)
    rows = []
    n_nodes = 0
    # 30 DENSE components (≈3 edges per node): the first star round
    # contracts a dense graph to ≈ one edge per non-root node, so a gate
    # between the two sizes provably exercises the in-loop trigger below
    for c in range(30):
        nodes = [f"n{c:02d}_{i:02d}" for i in range(rng.randint(3, 12))]
        n_nodes += len(nodes)
        for i in range(1, len(nodes)):
            rows.append((nodes[i], nodes[rng.randrange(0, i)]))
        for _ in range(2 * len(nodes)):
            a, b = rng.choice(nodes), rng.choice(nodes)
            if a != b:
                rows.append((a, b) if rng.random() < 0.5 else (b, a))
    rng.shuffle(rows)
    rows += rows[:10]  # duplicates
    edges = spark.createDataFrame(rows, "left_key string, right_key string")
    distributed = sorted(
        map(tuple, connected_components(edges, local_finish_max_edges=0).collect())
    )
    assert distributed, "expected non-empty components"
    entry_gated = sorted(
        map(
            tuple,
            connected_components(edges, local_finish_max_edges=10_000).collect(),
        )
    )
    assert entry_gated == distributed
    # in-loop trigger: gate below the distinct input size (entry probe
    # fails → at least one distributed round runs) but above the node
    # count (a contracted round's edge set is ≤ nodes − components)
    n_input = edges.select("left_key", "right_key").distinct().count()
    assert n_input > n_nodes, "fixture must start denser than its node count"
    in_loop = sorted(
        map(
            tuple,
            connected_components(edges, local_finish_max_edges=n_nodes).collect(),
        )
    )
    assert in_loop == distributed
