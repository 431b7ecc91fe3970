"""Sinks (SURVEY.md §2.1 S5–S8): stage checkpoint tables + CSV/JSON exports.

The reference persists per-row into SQLite (database.py:339-391) and
exports flattened CSV with a NO_MATCH sentinel (web.py:408-485) and a JSON
envelope (web.py:488-538). Here: format-parameterized stage tables —
Iceberg ``writeTo(...).createOrReplace()`` when a target is a table
identifier and an Iceberg catalog is configured (the production path named
by the north rule), parquet paths otherwise (tests/sandbox, where the
Iceberg runtime jar is absent) — and the exports as single declarative
writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_WARNED_AMBIGUOUS: set[str] = set()


def _is_table_identifier(path: str) -> bool:
    """Heuristic shared by all stage I/O: Iceberg targets are dotted
    multi-segment table identifiers (catalog.db.table); anything with a
    '/' — or a bare single segment like ``out``, which is a relative
    filesystem path — is a path.

    The single-dot no-slash case (``db.table`` — a default-catalog table
    identifier — vs ``out.parquet`` — a relative file path) is genuinely
    ambiguous; it is treated as a PATH (the pre-round-3 behavior would have
    treated it as a table) and warned once per target (ADVICE r3 low: the
    reclassification silently wrote a local file instead of a table). Use a
    fully-qualified ``catalog.db.table`` for Iceberg targets."""
    if "/" not in path and path.count(".") == 1 and path not in _WARNED_AMBIGUOUS:
        _WARNED_AMBIGUOUS.add(path)
        import warnings

        warnings.warn(
            f"stage target {path!r} is ambiguous (single-dot, no slash): "
            "treating it as a relative filesystem path, NOT a table "
            "identifier — use catalog.db.table for an Iceberg target",
            stacklevel=3,
        )
    return "/" not in path and path.count(".") >= 2


# Probe result per Spark application (keyed by applicationId — unique per
# context and stable for its lifetime, unlike id(spark), which CPython can
# reuse for a NEW session after the old one is garbage-collected). The
# probe issues blocking `SHOW NAMESPACES` SQL round-trips, so running it on
# EVERY write_stage(fmt=None) call would put one or more driver-side
# catalog queries in front of each stage write.
_ICEBERG_PROBE_CACHE: dict[str, bool] = {}


def iceberg_available(spark: SparkSession, refresh: bool = False) -> bool:
    """Probe for a usable Iceberg catalog: some ``spark.sql.catalog.<name>``
    conf points at an Iceberg implementation AND the class actually loads
    (config without the runtime jar raises on first use). Cached per Spark
    application — pass ``refresh=True`` after reconfiguring catalogs."""
    try:
        key = spark.sparkContext.applicationId
    except Exception:  # pragma: no cover - session without a live context
        return _probe_iceberg(spark)
    if not refresh and key in _ICEBERG_PROBE_CACHE:
        return _ICEBERG_PROBE_CACHE[key]
    _ICEBERG_PROBE_CACHE[key] = _probe_iceberg(spark)
    return _ICEBERG_PROBE_CACHE[key]


def _probe_iceberg(spark: SparkSession) -> bool:
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:  # pragma: no cover - session without a live context
        return False
    names = [
        k.split(".")[3]
        for k, v in confs
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 and "iceberg" in v.lower()
    ]
    for name in names:
        try:
            spark.sql(f"SHOW NAMESPACES IN {name}").collect()
            return True
        except Exception:  # noqa: BLE001 — jar missing / catalog unusable
            continue
    return False


def write_stage(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> None:
    """Checkpointed stage output, format-parameterized.

    ``fmt=None`` auto-selects: 'iceberg' when ``path`` is a table identifier
    and :func:`iceberg_available`, else 'parquet'. Both branches are
    overwrite = idempotent re-run; the resume contract is the parquet
    _SUCCESS marker / Iceberg table existence (plans/pipeline.py)."""
    if fmt is None:
        fmt = (
            "iceberg"
            if _is_table_identifier(path) and iceberg_available(df.sparkSession)
            else "parquet"
        )
    if fmt == "iceberg":
        w = df.writeTo(path).using("iceberg")
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    if partition_by:
        # a partitioned write of an EMPTY frame produces no part files at
        # all (just _SUCCESS), which is unreadable (no schema to infer).
        # Anchor the schema in a hidden sub-dir — names starting with '_'
        # are invisible to Spark's data-file discovery, so normal reads are
        # unaffected; read_stage falls back to it for the empty case.
        df.limit(0).write.mode("overwrite").parquet(os.path.join(path, "_schema"))


def stage_exists(spark: SparkSession, path: str) -> bool:
    if _is_table_identifier(path):
        try:
            return spark.catalog.tableExists(path)
        except Exception:  # noqa: BLE001 — no such catalog in this session
            return False
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _is_no_data_files_error(exc: Exception) -> bool:
    """True only for the one failure the ``_schema`` anchor exists for: a
    stage directory with NO data files to infer a schema from (the empty
    partitioned write). Anything else — corrupt footers, partially deleted
    data, permission failures — must propagate (ADVICE r4 low: the former
    blanket fallback read a CORRUPT stage back as an empty frame, masking
    data loss as an empty stage)."""
    condition = None
    for getter in ("getCondition", "getErrorClass"):
        fn = getattr(exc, getter, None)
        if fn is not None:
            try:
                condition = fn()
                break
            except Exception:  # pragma: no cover - non-captured exception
                pass
    if condition is not None:
        return condition == "UNABLE_TO_INFER_SCHEMA"
    return "UNABLE_TO_INFER_SCHEMA" in str(exc) or "Unable to infer schema" in str(exc)


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    if _is_table_identifier(path):
        return spark.table(path)
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # noqa: BLE001 — narrowed below
        anchor = os.path.join(path, "_schema")
        if _is_no_data_files_error(exc) and os.path.isdir(anchor):
            return spark.read.parquet(anchor)
        raise


def export_csv_best_matches(best: DataFrame, out_path: str) -> None:
    """S7: flat CSV of best match per entity; entities with no successful
    match get NO_MATCH sentinel values (web.py:461-472)."""
    flat = best.select(
        "entity_key",
        F.col("name").alias("entity_name"),
        "entity_type",
        F.coalesce(F.col("match_label"), F.lit("NO_MATCH")).alias("match_name"),
        F.coalesce(F.col("right_key"), F.lit("NO_MATCH")).alias("match_id"),
        F.coalesce(F.format_number(F.col("score"), 3), F.lit("0.000")).alias("match_score"),
        F.coalesce(F.col("confidence"), F.lit("none")).alias("confidence"),
    )
    flat.coalesce(1).write.mode("overwrite").option("header", True).csv(out_path)


def export_json_results(results: DataFrame, job_id: str, out_path: str) -> None:
    """S8: JSON export with the reference's envelope (job_info + results)."""
    enveloped = results.withColumn(
        "envelope",
        F.to_json(
            F.struct(
                F.lit(job_id).alias("job_id"),
                F.struct(*[F.col(c) for c in results.columns]).alias("result"),
            )
        ),
    ).select("envelope")
    enveloped.coalesce(1).write.mode("overwrite").text(out_path)
