"""Structured Streaming entry points: continuous encode of arriving
webtext files via foreachBatch over the batch pipeline."""
