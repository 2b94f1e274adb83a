"""Execution plans: the block encode/decode pipeline with lineage,
resume, salting, and per-partition metrics."""
