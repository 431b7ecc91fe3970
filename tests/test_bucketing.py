"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the shuffle entirely — the stage-output strategy for
repeatedly-joined tables at 100 TB (the reference's SQLite index on the FK,
database.py:98-100, lifted to Spark physics)."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark):
    import shutil

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)  # in-memory catalog
        # forgets tables between sessions; the managed location survives
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem"))

    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"]).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    # sf0.001 tables are broadcast-sized; disable broadcast so the plan
    # shows the co-located sort-merge path a 100 TB join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-located: the join itself needs no Exchange (only the final 1-key
    # aggregate shuffles)
    join_section = plan.split("HashAggregate")[0] if "HashAggregate" in plan else plan
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, plan

    # same numbers as the shuffled join
    plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]) \
        .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
