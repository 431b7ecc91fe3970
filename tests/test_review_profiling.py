"""Review/approval workflow (J5, P7, S13) and column profiling (P3, P4)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _scores(spark):
    rows = [
        # entity e1: two candidates
        ("e1", "Q1", 0.9, "very_high"),
        ("e1", "Q2", 0.6, "medium"),
        # entity e2: one candidate, low
        ("e2", "Q3", 0.4, "low"),
    ]
    return spark.createDataFrame(
        rows, "left_key string, right_key string, score double, confidence string"
    )


def test_apply_labels_approval_clears_siblings(spark):
    from metadata_reconciliation_tool_spark.plans.review import apply_labels

    labels = spark.createDataFrame(
        [("e1", "Q1", True, 1)],
        "entity_key string, auth_id string, user_approved boolean, label_seq long",
    )
    got = {
        (r.left_key, r.right_key): r.user_approved
        for r in apply_labels(_scores(spark), labels).collect()
    }
    assert got[("e1", "Q1")] is True
    assert got[("e1", "Q2")] is False  # sibling of an approved entity
    assert got[("e2", "Q3")] is None  # unreviewed


def test_latest_label_wins(spark):
    from metadata_reconciliation_tool_spark.plans.review import apply_labels

    labels = spark.createDataFrame(
        [("e1", "Q1", True, 1), ("e1", "Q1", False, 2)],  # approved then revoked
        "entity_key string, auth_id string, user_approved boolean, label_seq long",
    )
    got = {
        (r.left_key, r.right_key): r.user_approved
        for r in apply_labels(_scores(spark), labels).collect()
    }
    assert got[("e1", "Q1")] is False


def test_review_page_and_status(spark):
    from metadata_reconciliation_tool_spark.plans.review import job_status, review_page

    page = review_page(_scores(spark), page=1, per_page=10, min_confidence=0.5)
    rows = {r.left_key: r for r in page.collect()}
    assert set(rows) == {"e1"}  # e2's best (0.4) filtered by P7 threshold
    assert rows["e1"].highest_confidence == 0.9
    assert [m.match_id for m in rows["e1"].matches] == ["Q1", "Q2"]

    st = job_status(_scores(spark)).collect()[0]
    assert st.total_entities == 2
    assert st.successful_matches == 1
    assert abs(st.match_rate - 0.5) < 1e-9


def test_classify_columns(spark):
    from metadata_reconciliation_tool_spark.sources.profiling import classify_columns

    df = spark.createDataFrame(
        [
            ("John Smith", "visited Lake City today", "a; b; c", "42"),
            ("Doe, Jane", "north county fair", "x; y", "17"),
            ("Mary Brown", "port of entry", "m; n", "9"),
        ],
        "creator_name string, notes string, tags string, misc string",
    )
    got = classify_columns(df)
    assert got["creator_name"] == "person"  # header pattern
    assert got["notes"] == "place"  # data heuristic
    assert got["tags"] == "subject"  # header pattern ('tag')
    assert got["misc"] == "unknown"


def test_resolve_column_fuzzy(spark):
    from metadata_reconciliation_tool_spark.sources.profiling import resolve_column

    df = spark.createDataFrame([(1, 2)], "Creator_Name int, other int")
    assert resolve_column(df, "creator_name") == "Creator_Name"
    assert resolve_column(df, "creator") == "Creator_Name"
    assert resolve_column(df, "zzz") is None


def test_apply_labels_broadcast_gate_parity(spark):
    """Round-4 verdict item 3: the approved-entities attach broadcast is
    size-gated (labels are append-only, unbounded by contract). Gate forced
    off (broadcast_max_rows=0) must be row-identical to the default."""
    from metadata_reconciliation_tool_spark.plans.review import apply_labels

    labels = spark.createDataFrame(
        [("e1", "Q1", True, 1), ("e2", "Q3", False, 2)],
        "entity_key string, auth_id string, user_approved boolean, label_seq long",
    )
    default = sorted(map(tuple, apply_labels(_scores(spark), labels).collect()))
    forced = sorted(
        map(
            tuple,
            apply_labels(_scores(spark), labels, broadcast_max_rows=0).collect(),
        )
    )
    assert default == forced and len(default) == 3
