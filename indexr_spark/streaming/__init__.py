"""Realtime ingestion: Structured Streaming → rt segments → compaction."""
