"""Sources and sinks: parquet/text readers, routed parquet fan-out writers,
and the deterministic synthetic transcripts generator."""
