"""Incremental-path bench (round-4 verdict item 7): the production shape —
per-batch ingest latency and state-read cost before/after compaction — has
correctness tests (tests/test_incremental.py) but needed a committed bench.

Protocol (all walls + 1-min load averages disclosed, per the BENCH.md
protocol):

1. bootstrap a corpus with ReconPipeline (half the entity pool);
2. ingest K batches, each mixing already-seen entities (exercising the
   seen-key anti-join) with a slice of genuinely new ones — per-batch wall
   is the headline (the north rule's production shape: cost scales with
   the batch, never the corpus);
3. read the unioned state (best_matches + scoring counts) across all live
   per-batch dirs — the pre-compaction read cost;
4. compact() — leveled fold wall;
5. re-read the same state post-compaction;
6. ingest one more batch post-compaction (listdir + state union now
   O(consolidated dirs));
7. redeliver a committed batch id — the exactly-once no-op wall.

Usage: python tools/bench_incremental.py [out.json]
Prints ONE JSON line and writes it to the output path (default
bench_r5_incremental.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

# the script lives in tools/ — python puts tools/ on sys.path, not the
# repo root the package imports need
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r5_incremental.json"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pool = int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "8000"))
    boot_convs = int(os.environ.get("SPARK_GRAFT_INC_BOOT_CONVS", "40000"))
    batch_convs = int(os.environ.get("SPARK_GRAFT_INC_BATCH_CONVS", "4000"))
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "8"))

    from metadata_reconciliation_tool_spark.fixtures import (
        build_variants,
        entity_pool,
        gen_dictionary,
        gen_transcripts,
    )
    from metadata_reconciliation_tool_spark.plans.incremental import IncrementalRecon
    from metadata_reconciliation_tool_spark.plans.pipeline import ReconConfig, ReconPipeline
    from metadata_reconciliation_tool_spark.session import build_session

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus)
    work = os.environ.get("SPARK_GRAFT_INC_WORKDIR", "/dev/shm/bench_incremental")
    shutil.rmtree(work, ignore_errors=True)

    pool = entity_pool(n_pool)
    dictionary = gen_dictionary(spark, pool)
    half = n_pool // 2
    new_per_batch = max(1, half // (2 * (n_batches + 1)))
    seen_per_batch = max(1, new_per_batch // 2)

    loads: list[float] = []

    def clock(fn):
        loads.append(round(os.getloadavg()[0], 1))
        t0 = time.monotonic()
        r = fn()
        return round(time.monotonic() - t0, 2), r

    # materialize each input to parquet first so generation cost never
    # pollutes the measured ingest wall (mirrors bench.py's protocol)
    def mat(df, name):
        p = os.path.join(work, "inputs", name)
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    boot_tx = mat(
        gen_transcripts(spark, build_variants(pool[:half]), boot_convs, 16),
        "bootstrap",
    )
    batch_tx = []
    for i in range(n_batches + 1):
        new_lo = half + i * new_per_batch
        sl = pool[new_lo : new_lo + new_per_batch] + pool[
            i * seen_per_batch : (i + 1) * seen_per_batch
        ]
        batch_tx.append(
            mat(gen_transcripts(spark, build_variants(sl), batch_convs, 16), f"b{i}")
        )

    # warmup: spin up the Python UDF workers on a tiny pilot so worker
    # fork/import cost lands outside every measured wall
    pilot = entity_pool(40)
    ReconPipeline(
        spark,
        ReconConfig(job_id="pilot", work_dir=os.path.join(work, "pilot")),
    ).run(gen_transcripts(spark, build_variants(pilot), 160, 16), gen_dictionary(spark, pilot))

    cfg = ReconConfig(job_id="inc_bench", work_dir=work)
    boot_wall, _ = clock(lambda: ReconPipeline(spark, cfg).run(boot_tx, dictionary))

    inc = IncrementalRecon(spark, work, "inc_bench", auto_compact_every=None)
    batch_walls = []
    batch_new_entities = []
    for i in range(n_batches):
        w, r = clock(lambda i=i: inc.ingest_batch(batch_tx[i], dictionary))
        batch_walls.append(w)
        batch_new_entities.append(r["new_entities"].count())

    def read_state():
        return (inc.best_matches().count(), inc._read_state("scoring").count())

    pre_read_wall, pre_counts = clock(read_state)
    compact_wall, _ = clock(lambda: inc.compact())
    post_read_wall, post_counts = clock(read_state)
    assert pre_counts == post_counts, (pre_counts, post_counts)
    post_ingest_wall, _ = clock(lambda: inc.ingest_batch(batch_tx[n_batches], dictionary))
    redeliver_wall, _ = clock(lambda: inc.ingest_batch(batch_tx[1], dictionary, batch_id="b1"))

    result = {
        "metric": "incremental_ingest",
        "unit": "sec",
        "cpus": cpus,
        "bootstrap": {"convs": boot_convs, "wall": boot_wall},
        "batch_convs": batch_convs,
        "batch_walls": batch_walls,
        "batch_new_entities": batch_new_entities,
        "mean_batch_wall": round(sum(batch_walls) / len(batch_walls), 2),
        "state_read_wall_pre_compact": pre_read_wall,
        "compact_wall": compact_wall,
        "state_read_wall_post_compact": post_read_wall,
        "ingest_wall_post_compact": post_ingest_wall,
        "redelivery_noop_wall": redeliver_wall,
        "best_rows": post_counts[0],
        "scoring_rows": post_counts[1],
        "loads_1min": loads,
    }
    line = json.dumps(result)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
