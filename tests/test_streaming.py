"""Streaming ingest (Trigger.AvailableNow): drains new files incrementally,
skips already-checkpointed ones — the batch-incremental semantics the
reference implements with nightly delta scripts (SURVEY.md §2.11)."""

from __future__ import annotations

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.streaming.ingest import (
    read_ingested,
    stream_ingest_available_now,
)


def test_available_now_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    generate_web_pages(spark, 50, seed=42, partitions=2).write.parquet(
        src, mode="overwrite"
    )
    stream_ingest_available_now(spark, src, dst, ckpt)
    first = read_ingested(spark, dst)
    assert first.count() == 50
    cols = set(first.columns)
    assert {"url", "extracted_text", "n_tokens", "lang_guess", "quality"} <= cols

    # drop more files; a second drain must ingest ONLY the new ones
    generate_web_pages(spark, 30, seed=99, partitions=1).write.parquet(
        src, mode="append"
    )
    stream_ingest_available_now(spark, src, dst, ckpt)
    assert read_ingested(spark, dst).count() == 80
