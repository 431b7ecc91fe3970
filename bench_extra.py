"""Per-query isolation bench (guide §1.4): times each headline query with
the noop sink, N repeats, and optionally captures .explain("formatted") to
plans/r06/<query>_<tag>.txt. Does NOT replace bench.py (frozen for
measurement); numbers cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [--sf /root/testdata/sf1.0] [--reps 3]
                        [--queries q1,q2] [--plans-tag before] [--no-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "a4_pricing_summary",
    "j1_fk_join_agg",
    "j_multiway_topn",
    "w1_rank_topk",
    "st_windowed_rollup",
    "st_sessionize",
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "multisource_best_match",
    "multimodal_wav_features",
    "text_quality",
    "text_token_counts",
    "text_langid",
    "ann_brute_force_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--plans-tag", default=None, help="write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from metadata_reconciliation_tool_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus)
    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else HEADLINE

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    for name in names:
        df = qs[name](spark, args.sf)
        if args.plans_tag:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plans_dir, f"{name}_{args.plans_tag}.txt"), "w") as f:
                f.write(plan)
        reps = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            qs[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            reps.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = reps
        print(f"{name}: {reps} min={min(reps)}", flush=True)

    summary = {
        "sf": args.sf,
        "cpus": cpus,
        "load_avg_start": round(os.getloadavg()[0], 1),
        "queries": {k: {"reps": v, "min": min(v)} for k, v in results.items()},
        "total_min": round(sum(min(v) for v in results.values()), 3),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
