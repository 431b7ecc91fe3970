"""F6/F7/F8/F12 formula pins — hand-computed from the reference's piecewise
definitions (wikidata_cultural_client.py:263-322; reconciliation_engine.py:
178-210; data_sources.py:71-101)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_reconciliation_tool_spark.functions.confidence import (
    confidence_band_3,
    confidence_band_5,
    simple_score,
    viaf_source_boost,
    wikidata_confidence,
)

# (search, label, description, expected F7 score)
F7_CASES = [
    # exact → 0.95
    ("william shakespeare", "william shakespeare", "", 0.95),
    # exact + description bonus → capped path: 0.95 + 0.1 → 1.0 (cap)
    ("william shakespeare", "william shakespeare", "william shakespeare poet", 1.0),
    # substring: 'shakespeare' in 'william shakespeare'; overlap 1, union 2
    # → 0.5 + (1/2)*0.4 = 0.7
    ("shakespeare", "william shakespeare", "", 0.7),
    # no substring, overlap 1 of search's 2 tokens → 0.3 + (1/2)*0.4 = 0.5
    ("william blake", "william wordsworth", "", 0.5),
    # no overlap at all → 0.2
    ("emma hodge", "carleton college", "", 0.2),
    # description bonus on the 0.2 branch → 0.3
    ("emma hodge", "carleton college", "about emma hodge collection", 0.3),
]


@pytest.mark.parametrize("search,label,desc,expected", F7_CASES)
def test_f7_piecewise_pins(spark, search, label, desc, expected):
    df = spark.createDataFrame([(search, label, desc)], ["s", "l", "d"])
    got = df.select(
        wikidata_confidence(F.col("s"), F.col("l"), F.col("d")).alias("c")
    ).collect()[0].c
    assert got == pytest.approx(expected, abs=1e-9)


F6_CASES = [
    ("abc def", "abc def", 1.0),
    ("abc", "abc def", 0.8),       # substring
    ("abc xyz", "abc def", 1 / 3),  # jaccard
    ("", "abc", 0.0),
]


@pytest.mark.parametrize("q,l,expected", F6_CASES)
def test_f6_simple_score_pins(spark, q, l, expected):
    df = spark.createDataFrame([(q, l)], ["q", "l"])
    got = df.select(simple_score(F.col("q"), F.col("l")).alias("c")).collect()[0].c
    assert got == pytest.approx(expected, abs=1e-9)


def test_bands(spark):
    df = spark.createDataFrame([(0.95,), (0.75,), (0.55,), (0.35,), (0.1,)], ["s"])
    rows = df.select(
        confidence_band_3(F.col("s")).alias("b3"),
        confidence_band_5(F.col("s")).alias("b5"),
    ).collect()
    assert [r.b3 for r in rows] == ["high", "medium", "low", "low", "low"]
    assert [r.b5 for r in rows] == ["very_high", "high", "medium", "low", "very_low"]


def test_viaf_boost(spark):
    # F9: min(n/10, 0.2) — data_sources.py:260-292
    df = spark.createDataFrame([(1,), (2,), (5,), (100,)], ["n"])
    got = [r.b for r in df.select(viaf_source_boost(F.col("n")).alias("b")).collect()]
    assert got == pytest.approx([0.1, 0.2, 0.2, 0.2])
