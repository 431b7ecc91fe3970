"""Extraction-stage semantics + the driver's per-turn text-equality
invariant under stable (conv_id, turn_idx) ordering."""

from __future__ import annotations

import pyspark.sql.functions as F

from metadata_reconciliation_tool_spark.operators.extract import (
    distinct_entities,
    extract_entities,
    infer_entity_type_expr,
    parse_entity_type_expr,
)


def test_every_embedded_mention_recovered(spark, bundle):
    """Every variant the generator embedded appears in the extraction output
    with the right normalized form and type (extraction recall = 1)."""
    ents = extract_entities(bundle["transcripts"])
    got = {
        (r.norm_name, r.entity_type)
        for r in ents.select("norm_name", "entity_type").distinct().collect()
    }
    want = {(v.norm, v.entity_type) for v in bundle["variants"]}
    assert want <= got
    # nothing else was invented
    assert got <= want


def test_per_turn_text_equality_invariant(spark, bundle):
    """Driver invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — the pipeline reads transcripts without
    mutating them; re-reading in window order reproduces texts exactly."""
    t = bundle["transcripts"]
    a = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    b = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    assert a == b
    # (conv_id, turn_idx) is a dense unique key
    n = t.count()
    assert t.select("conv_id", "turn_idx").distinct().count() == n
    # every extracted mention's text round-trips: the mention is a literal
    # substring of its source turn
    ents = extract_entities(t)
    joined = ents.join(t, ["conv_id", "turn_idx"]).select("name", "text")
    bad = joined.filter(~F.col("text").contains(F.col("name"))).count()
    assert bad == 0


def test_distinct_entities_deterministic_representative(spark, bundle):
    ents = extract_entities(bundle["transcripts"])
    d1 = distinct_entities(ents).orderBy("entity_key").collect()
    d2 = distinct_entities(ents.repartition(3)).orderBy("entity_key").collect()
    assert d1 == d2
    keys = [r.entity_key for r in d1]
    assert len(keys) == len(set(keys))


def test_type_inference_f14(spark):
    cases = {
        "Dr. John Smith": "person",
        "Museum Of Fine Arts": "organization",
        "Lake Tahoe": "place",
        "John Smith": "person",
        "Smith, John": "person",
        "xyzzy": "unknown",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["n"])
    got = {r.n: r.t for r in df.select("n", infer_entity_type_expr(F.col("n")).alias("t")).collect()}
    assert got == cases


def test_type_parse_f13(spark):
    cases = {"Author": "person", "LOCATION": "place", "museum": "organization",
             "Topic": "subject", "??": "unknown"}
    df = spark.createDataFrame([(k,) for k in cases], ["n"])
    got = {r.n: r.t for r in df.select("n", parse_entity_type_expr(F.col("n")).alias("t")).collect()}
    assert got == cases
