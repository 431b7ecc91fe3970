"""Pipeline orchestration: checkpointed stages, idempotent resume, lineage
and metrics tables."""
