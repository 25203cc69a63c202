"""Output sinks beyond parquet: per-document CSV files, eval reports."""
