"""Structured Streaming ingest: incremental index appends."""
