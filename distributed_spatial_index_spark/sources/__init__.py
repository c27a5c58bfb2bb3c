"""Sources & sinks (SURVEY.md §2.1): parquet table loaders, geo enrichment,
the synthetic interleaved-document generator (input_hint shape), and the
checkpoint/manifest table layer (parquet fallback for Iceberg)."""
