"""Incremental reconciliation: batch-2 ingest over batch-1 state must land
in exactly the clusters a full run over everything produces."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_incremental_equals_full_run(spark, bundle, tmp_path):
    from metadata_reconciliation_tool_spark.plans.incremental import IncrementalRecon
    from metadata_reconciliation_tool_spark.plans.pipeline import (
        ReconConfig,
        ReconPipeline,
    )

    t = bundle["transcripts"]
    batch1 = t.filter(F.crc32(F.col("conv_id")) % 2 == 0)
    batch2 = t.filter(F.crc32(F.col("conv_id")) % 2 == 1)

    # bootstrap state with a full run over batch 1
    inc_work = str(tmp_path / "inc")
    cfg1 = ReconConfig(job_id="j", work_dir=inc_work, force=True, collect_metrics=False)
    ReconPipeline(spark, cfg1).run(batch1, bundle["dictionary"])

    # ingest batch 2 incrementally
    inc = IncrementalRecon(spark, inc_work, "j")
    out = inc.ingest_batch(batch2, bundle["dictionary"])
    assert out["new_entities"].count() > 0  # batch 2 contributed new keys

    # ground truth: one full run over all transcripts
    full_work = str(tmp_path / "full")
    cfg2 = ReconConfig(job_id="j", work_dir=full_work, force=True, collect_metrics=False)
    full = ReconPipeline(spark, cfg2).run(t, bundle["dictionary"])

    inc_clusters = {
        r.entity_key: r.cluster_id for r in out["clusters"].collect()
    }
    full_clusters = {
        r.entity_key: r.cluster_id for r in full["clusters"].collect()
    }
    assert inc_clusters == full_clusters
