"""spark-submit entry point (tools/run_pipeline.py) smoke: synthetic run,
resume on rerun, CSV export."""

from __future__ import annotations

import glob
import sys


def test_cli_synthetic_run_and_resume(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "tools")
    import run_pipeline

    work = str(tmp_path / "work")
    export = str(tmp_path / "export")
    rc = run_pipeline.main(
        [
            "--synthetic",
            "--work-dir", work,
            "--job-id", "cli1",
            "--export-csv", export,
        ]
    )
    assert rc == 0
    csvs = glob.glob(f"{export}/*.csv")
    assert csvs and open(csvs[0]).readline().startswith("entity_key,")
    # rerun without --force resumes from checkpoints (fast, identical)
    rc2 = run_pipeline.main(["--synthetic", "--work-dir", work, "--job-id", "cli1"])
    assert rc2 == 0
