"""applyInPandasWithState conversation tracker: the streaming state must
converge to the batch ground truth across micro-batches."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_conversation_tracker_matches_batch(spark, bundle, tmp_path):
    from metadata_reconciliation_tool_spark.streaming.stateful import (
        stream_conversation_tracker,
    )

    src = tmp_path / "tin"
    # write the fixture transcripts as several files → several micro-batches
    bundle["transcripts"].repartition(8).write.parquet(str(src))
    q = stream_conversation_tracker(
        spark, str(src), str(tmp_path / "ck"), str(tmp_path / "out")
    )
    q.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "out"))
    # last update per conversation = the row with the highest n_turns
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(F.desc("n_turns"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    truth = (
        spark.read.parquet(str(src))
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("t_turns"),
            F.max("turn_idx").alias("t_max_idx"),
        )
    )
    j = final.join(truth, "conv_id")
    assert j.count() == truth.count()
    assert j.filter("n_turns <> t_turns").count() == 0
    assert j.filter("max_turn_idx <> t_max_idx").count() == 0
    # mentions: every 3rd turn carries one (fixture construction)
    total_mentions = final.agg(F.sum("n_mentions")).collect()[0][0]
    n_turns_total = spark.read.parquet(str(src)).count()
    # turn ids 0,3,6,… carry mentions → ceil(n/3) of them in [0, n)
    assert total_mentions == (n_turns_total + 2) // 3
