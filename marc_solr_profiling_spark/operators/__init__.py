"""Operators: index build, BM25 scoring, profiling aggregations, dedup,
similarity search, incremental merge."""
