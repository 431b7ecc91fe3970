"""Sources & sinks: flexible CSV scan (S1), strict read (S4), CSV export
with NO_MATCH sentinel (S7), JSON envelope export (S8)."""

from __future__ import annotations

import glob
import json

import pyspark.sql.functions as F
from pyspark.sql import types as T


def test_read_csv_flexible_encodings_and_delims(spark, tmp_path):
    from metadata_reconciliation_tool_spark.sources.readers import read_csv_flexible

    # latin-1 + semicolon — the reference's try-all loop must find it
    p = tmp_path / "latin.csv"
    p.write_bytes("name;café\nJosé;1\nRené;2\n".encode("latin-1"))
    df = read_csv_flexible(spark, str(p))
    assert len(df.columns) == 2
    assert df.count() == 2

    # plain comma utf-8
    p2 = tmp_path / "plain.csv"
    p2.write_text("a,b\n1,2\n")
    df2 = read_csv_flexible(spark, str(p2))
    assert df2.columns == ["a", "b"]


def test_read_csv_strict_failfast(spark, tmp_path):
    from metadata_reconciliation_tool_spark.sources.readers import read_csv_strict

    p = tmp_path / "s.csv"
    p.write_text("a,b\n1,x\n")
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    df = read_csv_strict(spark, str(p), schema)
    assert [r.a for r in df.collect()] == [1]


def test_export_csv_no_match_sentinel(spark, tmp_path):
    from metadata_reconciliation_tool_spark.sources.writers import (
        export_csv_best_matches,
    )

    best = spark.createDataFrame(
        [
            ("k1", "Found Name", "person", "Q1", "Found Label", 0.9, "high"),
            ("k2", "Lost Name", "person", None, None, None, None),
        ],
        "entity_key string, name string, entity_type string, right_key string,"
        " match_label string, score double, confidence string",
    )
    out = str(tmp_path / "export_csv")
    export_csv_best_matches(best, out)
    lines = []
    for f in glob.glob(f"{out}/*.csv"):
        lines += open(f).read().strip().splitlines()
    header, rows = lines[0], sorted(lines[1:])
    assert header.split(",")[:3] == ["entity_key", "entity_name", "entity_type"]
    # S7: entities without a successful match export NO_MATCH sentinels
    # (web.py:461-472)
    assert any("NO_MATCH" in r and "k2" in r for r in rows)
    assert any("Q1" in r and "0.900" in r for r in rows)


def test_export_json_envelope(spark, tmp_path):
    from metadata_reconciliation_tool_spark.sources.writers import export_json_results

    df = spark.createDataFrame([("k1", 0.9)], "entity_key string, score double")
    out = str(tmp_path / "export_json")
    export_json_results(df, "job42", out)
    lines = []
    for f in glob.glob(f"{out}/part-*"):
        lines += open(f).read().strip().splitlines()
    env = json.loads(lines[0])
    # S8 envelope: job info + nested result (web.py:488-538)
    assert env["job_id"] == "job42"
    assert env["result"]["entity_key"] == "k1"


def test_preview_columns(spark, tmp_path):
    from metadata_reconciliation_tool_spark.sources.readers import preview_columns

    p = tmp_path / "pv.csv"
    p.write_text("x,y\n1,2\n3,4\n5,6\n")
    cols, sample = preview_columns(spark, str(p), n=2)
    assert cols == ["x", "y"]
    assert len(sample) == 2


def test_table_identifier_heuristic():
    """ADVICE r02: a bare single segment ('out') is a relative filesystem
    path, not an Iceberg identifier — only dotted catalog.db.table (no '/')
    qualifies."""
    from metadata_reconciliation_tool_spark.sources.writers import (
        _is_table_identifier,
    )

    assert _is_table_identifier("catalog.db.table")
    assert _is_table_identifier("ice.recon.stage_scoring")
    assert not _is_table_identifier("out")
    assert not _is_table_identifier("stage_scoring")
    assert not _is_table_identifier("db.table")  # ambiguous → treated as path
    assert not _is_table_identifier("/tmp/work/stage_scoring")
    assert not _is_table_identifier("work/catalog.db.table")


def test_iceberg_probe_cached_per_session(spark):
    """ADVICE r02: the SHOW NAMESPACES probe must run at most once per
    SparkSession, not once per write_stage call."""
    from metadata_reconciliation_tool_spark.sources import writers as W

    key = spark.sparkContext.applicationId  # the cache key (stable per app,
    # unlike id(spark), which CPython reuses after GC)
    W._ICEBERG_PROBE_CACHE.pop(key, None)
    calls = {"n": 0}
    orig = W._probe_iceberg

    def counting(s):
        calls["n"] += 1
        return orig(s)

    W._probe_iceberg = counting
    try:
        first = W.iceberg_available(spark)
        for _ in range(5):
            assert W.iceberg_available(spark) == first
        assert calls["n"] == 1
        W.iceberg_available(spark, refresh=True)
        assert calls["n"] == 2
    finally:
        W._probe_iceberg = orig
        W._ICEBERG_PROBE_CACHE.pop(key, None)


def test_read_stage_corrupt_data_raises_not_empty(spark, tmp_path):
    """ADVICE r4 low: read_stage's _schema fallback is ONLY for the
    empty-partitioned-stage case. A corrupt part file (bad footer) with an
    intact _schema anchor must RAISE — never silently read back as an
    empty frame (data loss masked as an empty stage)."""
    import glob
    import os

    import pytest

    from metadata_reconciliation_tool_spark.sources import writers as W

    path = str(tmp_path / "stage_corrupt")
    df = spark.createDataFrame(
        [("a", "k1"), ("b", "k2")], "v string, pk string"
    )
    W.write_stage(df, path, ["pk"])
    # sanity: reads fine before corruption
    assert W.read_stage(spark, path).count() == 2
    parts = [
        p
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if "_schema" not in p
    ]
    assert parts
    for p in parts:
        with open(p, "wb") as fh:
            fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        W.read_stage(spark, path).collect()

    # the empty-stage fallback still works: no data files at all, anchor intact
    empty = str(tmp_path / "stage_empty")
    W.write_stage(df.limit(0), empty, ["pk"])
    assert W.read_stage(spark, empty).count() == 0
