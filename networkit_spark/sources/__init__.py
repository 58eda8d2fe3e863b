"""Sources: corpus ingestion (the Iceberg-shaped repos table), graph file
format readers, and deterministic synthetic generators."""
