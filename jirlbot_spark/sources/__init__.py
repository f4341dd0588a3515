"""Sources & sinks: the table store (atomic multi-table batch commits over
Parquet; Iceberg catalog on a cluster), seed-list readers, and deterministic
synthetic fixture generators (image+caption pages, web graph, robots)."""
