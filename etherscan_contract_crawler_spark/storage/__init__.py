"""Storage: snapshot-committed tables with lineage (Iceberg-semantics layer)."""
