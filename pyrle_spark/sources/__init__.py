"""Sources & sinks: deterministic webtext synthesis and the Iceberg-style
table layout (parquet data files + JSON snapshot/manifest metadata)."""
