from __future__ import annotations

import pytest

from metadata_reconciliation_tool_spark.fixtures import fixture_bundle
from metadata_reconciliation_tool_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[8]", shuffle_partitions=8, app_name="pytest")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def bundle(spark):
    return fixture_bundle(spark, n_entities=40, n_convs=160, turns_per_conv=16)


@pytest.fixture(scope="session")
def pipeline_out(spark, bundle, tmp_path_factory):
    from metadata_reconciliation_tool_spark.plans.pipeline import (
        ReconConfig,
        ReconPipeline,
    )

    work = str(tmp_path_factory.mktemp("recon_work"))
    cfg = ReconConfig(job_id="t1", work_dir=work, force=True)
    out = ReconPipeline(spark, cfg).run(bundle["transcripts"], bundle["dictionary"])
    out["_work_dir"] = work
    return out
