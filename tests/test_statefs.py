"""Job-state FS shim (round-4 verdict item 6): all driver-side state
metadata — commit markers, covers manifests, job config, the reflect
sidecar, batch listings — must go through sources/statefs, so a
production deployment can re-point it at an object store without touching
the plans layer. The MemStateFS fake proves it: a full bootstrap + ingest
+ compact + redelivery flow runs with every metadata decision served from
memory, and leaves ZERO metadata files on the local filesystem."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from metadata_reconciliation_tool_spark.sources.statefs import (
    LocalStateFS,
    MemStateFS,
)


def test_mem_statefs_prefix_semantics(tmp_path):
    fs = MemStateFS()
    root = str(tmp_path / "j")
    assert not fs.isdir(root) and not fs.exists(root)
    fs.write_text(os.path.join(root, "batches", "b0", "_COMMITTED"), "")
    fs.write_text(os.path.join(root, "batches", "b1", "covers.json"), "[]")
    assert fs.isdir(os.path.join(root, "batches"))
    assert fs.listdir(os.path.join(root, "batches")) == ["b0", "b1"]
    assert fs.exists(os.path.join(root, "batches", "b0", "_COMMITTED"))
    assert fs.exists(os.path.join(root, "batches", "b0"))  # prefix-exists
    assert fs.read_text(os.path.join(root, "batches", "b1", "covers.json")) == "[]"
    fs.rmtree(os.path.join(root, "batches", "b0"))
    assert fs.listdir(os.path.join(root, "batches")) == ["b1"]
    import pytest

    with pytest.raises(FileNotFoundError):
        fs.read_text(os.path.join(root, "nope.json"))
    with pytest.raises(FileNotFoundError):
        fs.rmtree(os.path.join(root, "nope"))


def _run_flow(spark, bundle, work, fs):
    from metadata_reconciliation_tool_spark.plans.incremental import IncrementalRecon
    from metadata_reconciliation_tool_spark.plans.pipeline import (
        ReconConfig,
        ReconPipeline,
    )

    t = bundle["transcripts"]
    b1 = t.filter(F.crc32(F.col("conv_id")) % 3 == 0)
    b2 = t.filter(F.crc32(F.col("conv_id")) % 3 == 1)
    b3 = t.filter(F.crc32(F.col("conv_id")) % 3 == 2)
    cfg = ReconConfig(job_id="j", work_dir=work, force=True, collect_metrics=False)
    ReconPipeline(spark, cfg, fs=fs).run(b1, bundle["dictionary"])
    inc = IncrementalRecon(spark, work, "j", fs=fs)
    inc.ingest_batch(b2, bundle["dictionary"], batch_id="k2")
    inc.ingest_batch(b3, bundle["dictionary"], batch_id="k3")
    inc.compact()
    # redelivery of a compacted batch: must stay a recognized no-op
    ghost = inc.ingest_batch(b2, bundle["dictionary"], batch_id="k2")
    assert ghost["new_best"].count() == 0
    return (
        sorted(map(tuple, inc.best_matches().collect())),
        sorted(map(tuple, inc._read_state("entities_distinct").collect())),
    )


def test_incremental_flow_on_fake_remote_fs(spark, bundle, tmp_path):
    mem = MemStateFS()
    mem_work = str(tmp_path / "mem")
    got = _run_flow(spark, bundle, mem_work, mem)

    # identical results through the local shim
    want = _run_flow(spark, bundle, str(tmp_path / "loc"), LocalStateFS())
    assert got == want

    # the fake-remote run left NO metadata files on the local filesystem —
    # every marker/manifest/config/sidecar decision went through the shim
    local_meta = [
        p
        for pat in ("_COMMITTED", "covers.json", "job_config.json",
                    "clusters_reflect.json")
        for p in glob.glob(os.path.join(mem_work, "**", pat), recursive=True)
    ]
    assert local_meta == []
    # and the shim actually holds them
    keys = "\n".join(mem.blobs)
    for pat in ("_COMMITTED", "covers.json", "job_config.json",
                "clusters_reflect.json"):
        assert pat in keys
