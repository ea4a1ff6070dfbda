"""Structured Streaming pipelines: ingestion (validate → partitioned
parquet sink) and watermarked window analytics."""
