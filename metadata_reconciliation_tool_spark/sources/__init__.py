"""Readers (parquet / flexible CSV / Iceberg-if-available) and writers
(stage checkpoints, CSV/JSON exports)."""
