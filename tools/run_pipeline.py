"""spark-submit entry point for the reconciliation pipeline.

Production invocation (north rule: multi-executor cluster via
spark-submit --py-files):

    zip -r engine.zip metadata_reconciliation_tool_spark/
    spark-submit \\
        --master yarn --deploy-mode cluster \\
        --py-files engine.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        --conf spark.sql.execution.arrow.pyspark.enabled=true \\
        tools/run_pipeline.py \\
        --transcripts catalog.db.transcripts \\
        --dictionary /warehouse/authority_dictionary \\
        --work-dir hdfs:///recon/work --job-id nightly_2026_08_16

Local smoke:

    python tools/run_pipeline.py --synthetic --work-dir /tmp/recon_cli \\
        --job-id demo --export-csv /tmp/recon_cli/export

Stages are checkpointed; rerunning the same --job-id resumes from the last
completed stage (idempotent — delete a stage dir to force its recompute).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcripts", help="parquet path or Iceberg table of transcripts")
    ap.add_argument("--dictionary", help="parquet path of the authority dictionary")
    ap.add_argument("--synthetic", action="store_true",
                    help="use the deterministic synthetic fixture bundle instead")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--job-id", required=True)
    ap.add_argument("--match-threshold", type=float, default=0.70)
    ap.add_argument("--success-threshold", type=float, default=0.5)
    ap.add_argument("--max-block-size", type=int, default=1000)
    ap.add_argument("--force", action="store_true", help="recompute all stages")
    ap.add_argument("--export-csv", help="write the best-match CSV export here")
    ap.add_argument("--export-json", help="write the JSON results export here")
    args = ap.parse_args(argv)

    from metadata_reconciliation_tool_spark.plans.pipeline import (
        ReconConfig,
        ReconPipeline,
    )
    from metadata_reconciliation_tool_spark.session import build_session
    from metadata_reconciliation_tool_spark.sources import writers as W
    from metadata_reconciliation_tool_spark.sources.readers import read_transcripts

    spark = build_session(app_name=f"recon_{args.job_id}")
    if args.synthetic:
        from metadata_reconciliation_tool_spark.fixtures import fixture_bundle

        b = fixture_bundle(spark)
        transcripts, dictionary = b["transcripts"], b["dictionary"]
    else:
        if not (args.transcripts and args.dictionary):
            ap.error("--transcripts and --dictionary required without --synthetic")
        transcripts = read_transcripts(spark, args.transcripts)
        dictionary = spark.read.parquet(args.dictionary)

    cfg = ReconConfig(
        job_id=args.job_id,
        work_dir=args.work_dir,
        match_threshold=args.match_threshold,
        success_threshold=args.success_threshold,
        max_block_size=args.max_block_size,
        force=args.force,
    )
    out = ReconPipeline(spark, cfg).run(transcripts, dictionary)
    if args.export_csv:
        W.export_csv_best_matches(out["best"], args.export_csv)
    if args.export_json:
        W.export_json_results(out["best"], args.job_id, args.export_json)
    n = out["best"].count()
    print(f"job {args.job_id}: {n} entities reconciled; stages under "
          f"{args.work_dir}/{args.job_id}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
