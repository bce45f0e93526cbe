"""Sources & sinks: parquet-native readers/writers with the reference's
ingestion semantics (idempotent upsert, unique-key invariant, truncate)."""
