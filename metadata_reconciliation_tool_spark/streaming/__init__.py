"""Structured Streaming variants of the batch rollups."""
