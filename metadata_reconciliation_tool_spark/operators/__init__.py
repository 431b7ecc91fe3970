"""Dataflow operators: extraction, multi-pass blocking, pair scoring,
ranking, iterative connected-components clustering, dedup suite, similarity
search, multimodal plumbing."""
