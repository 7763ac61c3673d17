"""Sources/sinks beyond plain read_parquet."""
