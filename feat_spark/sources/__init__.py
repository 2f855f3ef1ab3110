"""Sources & sinks: parquet/Iceberg seam, deterministic synthesizers."""
