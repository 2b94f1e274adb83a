"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal plumbing.  Each operator ships with a
duckdb oracle twin (functions/registry.py) for the driver's gate."""
