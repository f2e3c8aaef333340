"""Sources/sinks: the dedup package table model."""
