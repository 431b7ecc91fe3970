"""Normalization semantics pins + Spark↔Python twin parity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_reconciliation_tool_spark.fixtures import entity_key_py, token_sort_py
from metadata_reconciliation_tool_spark.functions.normalize import (
    clean_value,
    entity_key,
    multi_value_split,
    nonempty_name_filter,
    normalize_name_py,
    normalize_name_unicode,
    token_sort,
)

TRICKY = [
    "William Shakespeare",
    "  SHAKESPEARE,   William  ",
    '["Dr. Emma B. Hodge"]',
    "Ünïcödé Nämé",
    "Ōe Kenzaburō",       # NFKC + macrons
    "O'Connell-Smith",
    "a",
    "नाम परीक्षण",          # non-Latin letters survive \p{L}
    "x  \t y",
]


def test_normalize_twin_parity(spark):
    df = spark.createDataFrame([(s,) for s in TRICKY], ["s"])
    got = [r.n for r in df.select(normalize_name_unicode(F.col("s")).alias("n")).collect()]
    want = [normalize_name_py(s) for s in TRICKY]
    assert got == want


def test_clean_value_reference_semantics(spark):
    # P8/F2/F3: metadata_parser.py:233-260 — trim, collapse, strip wrappers
    cases = {
        "  a   b  ": "a b",
        "[bracketed]": "bracketed",
        "(parens)": "parens",
        '"quoted"': "quoted",
        "'single'": "single",
        "[mixed)  ": "mixed",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["s"])
    got = {r.s: r.c for r in df.select("s", clean_value(F.col("s")).alias("c")).collect()}
    assert got == cases


def test_multi_value_split_first_match_wins(spark):
    # metadata_parser.py:262-278: only the FIRST present separator splits
    cases = [
        ("a; b, c", ["a", "b, c"]),       # '; ' beats ','
        ("a|b and c", ["a", "b and c"]),  # '|' beats ' and '
        ("a and b", ["a", "b"]),
        ("plain", ["plain"]),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["s"])
    got = [r.v for r in df.select(multi_value_split(F.col("s")).alias("v")).collect()]
    assert got == [v for _, v in cases]


def test_entity_key_twin_parity(spark):
    df = spark.createDataFrame([("william shakespeare", "person")], ["n", "t"])
    got = df.select(entity_key(F.col("n"), F.col("t")).alias("k")).collect()[0].k
    assert got == entity_key_py("william shakespeare", "person")


def test_token_sort_twin(spark):
    df = spark.createDataFrame([("shakespeare william b",)], ["n"])
    got = df.select(token_sort(F.col("n")).alias("t")).collect()[0].t
    assert got == token_sort_py("shakespeare william b") == "b shakespeare william"


@pytest.mark.parametrize(
    "value,keep",
    [("ok name", True), ("", False), ("  ", False), ("nan", False),
     ("None", False), ("x", False), ("xy", True)],
)
def test_nonempty_name_filter(spark, value, keep):
    # P1/P9: reconciliation_engine.py:476-478 + metadata_parser.py:228
    df = spark.createDataFrame([(value,)], ["s"])
    n = df.filter(nonempty_name_filter(F.col("s"))).count()
    assert (n == 1) is keep
