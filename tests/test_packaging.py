"""spark-submit packaging (north rule: "run via spark-submit --py-files")
and the format-parameterized stage writer (Iceberg in production, parquet
in the sandbox)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_deterministic_and_complete(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package import build_zip

    z1 = build_zip(str(tmp_path / "a.zip"))
    z2 = build_zip(str(tmp_path / "b.zip"))
    b1, b2 = open(z1, "rb").read(), open(z2, "rb").read()
    assert b1 == b2  # deterministic artifact

    import zipfile

    names = set(zipfile.ZipFile(z1).namelist())
    for required in (
        "metadata_reconciliation_tool_spark/plans/pipeline.py",
        "metadata_reconciliation_tool_spark/operators/blocking.py",
        "metadata_reconciliation_tool_spark/functions/similarity.py",
    ):
        assert required in names


@pytest.mark.parametrize("fmt", ["parquet", "iceberg"])
def test_write_stage_roundtrip_per_format(spark, tmp_path, fmt):
    from metadata_reconciliation_tool_spark.sources.writers import (
        iceberg_available,
        read_stage,
        stage_exists,
        write_stage,
    )

    if fmt == "iceberg":
        if not iceberg_available(spark):
            pytest.skip("Iceberg runtime jar not in this sandbox — "
                        "branch exercised on clusters with a configured catalog")
        target = "iceberg_cat.db.stage_roundtrip"
    else:
        target = str(tmp_path / "stage_roundtrip")

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    assert not stage_exists(spark, target)
    write_stage(df, target, fmt=fmt)
    assert stage_exists(spark, target)
    assert sorted((r.k, r.v) for r in read_stage(spark, target).collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # idempotent overwrite (the resume contract)
    write_stage(df, target, fmt=fmt)
    assert read_stage(spark, target).count() == 2


def _find_spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


def test_spark_submit_pyfiles_smoke(tmp_path):
    """The documented deployment command actually runs: build the zip, then
    spark-submit --py-files from a neutral cwd (package import must come
    from the zip, not the repo checkout)."""
    spark_submit = _find_spark_submit()
    if spark_submit is None:
        pytest.skip("spark-submit launcher not found")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package import build_zip

    z = build_zip(str(tmp_path / "mrt_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("SPARK_LOCAL_DIRS", "/tmp")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", z,
            os.path.join(REPO, "tools", "submit_pipeline.py"),
            "--smoke",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "best_matches=" in proc.stdout
