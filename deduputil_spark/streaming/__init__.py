"""Structured Streaming operators (incremental dedup)."""
