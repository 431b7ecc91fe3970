"""Scalar function layer: normalization, similarity batteries, confidence
formulas, text statistics. Pure Column expressions wherever Catalyst can
express the semantics; Arrow-batched pandas UDFs for the rest. No per-row
Python anywhere."""
