"""spark-submit entry point for the reconciliation pipeline.

    spark-submit --master <cluster> --py-files dist/mrt_spark.zip \
        tools/submit_pipeline.py [--smoke | <transcripts> <dictionary> <work_dir>]

With ``--smoke`` (used by the packaging test) it runs the pipeline on the
tiny deterministic fixture bundle and exits 0 iff best-match rows exist.
Otherwise transcripts/dictionary are parquet paths or Iceberg table
identifiers (sources.readers.read_transcripts resolves both).

Imports of the package happen INSIDE main() — on a cluster the package
arrives via --py-files, which lands on sys.path before main runs.
"""

from __future__ import annotations

import sys


def main() -> int:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mrt_spark_pipeline").getOrCreate()
    from metadata_reconciliation_tool_spark.plans.pipeline import (
        ReconConfig,
        ReconPipeline,
    )

    if "--smoke" in sys.argv:
        from metadata_reconciliation_tool_spark.fixtures import fixture_bundle

        b = fixture_bundle(spark, n_entities=20, n_convs=40, turns_per_conv=8)
        transcripts, dictionary = b["transcripts"], b["dictionary"]
        work_dir = "/tmp/mrt_submit_smoke"
        force = True
    else:
        if len(sys.argv) < 4:
            print(__doc__, file=sys.stderr)
            return 2
        from metadata_reconciliation_tool_spark.sources.readers import read_transcripts

        transcripts = read_transcripts(spark, sys.argv[1])
        dictionary = read_transcripts(spark, sys.argv[2])
        work_dir = sys.argv[3]
        force = False

    cfg = ReconConfig(job_id="submit", work_dir=work_dir, force=force)
    out = ReconPipeline(spark, cfg).run(transcripts, dictionary)
    n = out["best"].count()
    print(f"best_matches={n}")
    return 0 if n > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
