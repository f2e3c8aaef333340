"""Spark operators re-realizing the reference's dedup/similarity semantics."""
