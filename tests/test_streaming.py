"""Streaming ingest (Trigger.AvailableNow): drains new files incrementally,
skips already-checkpointed ones — the batch-incremental semantics the
reference implements with nightly delta scripts (SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.streaming.ingest import (
    read_ingested,
    stream_dedup_gate,
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


def test_stream_dedup_gate_across_batches(spark, tmp_path):
    """First arrival of a content digest passes; re-arrivals are dropped —
    within a batch AND across micro-batches via the state store."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    base = generate_web_pages(spark, 20, seed=42, partitions=2)
    base.write.parquet(src, mode="overwrite")
    # same-batch duplicates: re-append the SAME 20 pages under new file
    # names (identical text, identical urls)
    base.write.parquet(src, mode="append")
    stream_dedup_gate(spark, src, dst, ckpt)
    out1 = spark.read.parquet(dst)
    assert out1.count() == 20
    assert out1.select("digest").distinct().count() == 20

    # next batch: 20 old duplicates + 10 genuinely new pages
    base.write.parquet(src, mode="append")
    generate_web_pages(spark, 10, seed=7, partitions=1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" fresh"))
    ).write.parquet(src, mode="append")
    stream_dedup_gate(spark, src, dst, ckpt)
    out2 = spark.read.parquet(dst)
    assert out2.count() == 30
    assert out2.select("digest").distinct().count() == 30


def test_stream_fuzzy_dedup_gate_vs_archive(spark, tmp_path):
    """Streaming incremental dedup against a stored archive band table:
    arriving pages that near-duplicate archive docs are dropped, the
    drained output equals the batch dedup_against keep set, and a
    re-drain against the same checkpoint appends nothing."""
    from marc_solr_profiling_spark.operators.dedup import (
        dedup_against, minhash_band_table)
    from marc_solr_profiling_spark.streaming.ingest import (
        stream_fuzzy_dedup_gate)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    archive = generate_web_pages(spark, 30, seed=42, partitions=2)
    bands = minhash_band_table(archive, key_col="url")

    # new crawl: 10 fresh pages + 5 exact copies of archive pages
    fresh = generate_web_pages(spark, 10, seed=7, partitions=1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" genuinely new tail")))
    dups = archive.limit(5).withColumn(
        "url", F.concat(F.lit("http://recrawl/"), F.col("url")))
    fresh.unionByName(dups).write.parquet(src, mode="overwrite")

    stream_fuzzy_dedup_gate(
        spark, src, dst, ckpt, old_docs=archive, old_bands=bands,
        key_col="url", threshold=0.2)
    out = spark.read.parquet(dst)

    new_docs = spark.read.parquet(src)
    want = new_docs.join(
        dedup_against(new_docs, archive, key_col="url", threshold=0.2)
        .filter(F.col("kept")).select("url"), "url", "left_semi")
    assert sorted(r["url"] for r in out.select("url").collect()) == \
           sorted(r["url"] for r in want.select("url").collect())
    # the 5 recrawled copies are gone, the 10 fresh pages survive
    assert out.filter(F.col("url").startswith("http://recrawl/")).count() == 0
    assert out.count() == 10

    # re-drain: checkpoint remembers the processed files
    stream_fuzzy_dedup_gate(
        spark, src, dst, ckpt, old_docs=archive, old_bands=bands,
        key_col="url", threshold=0.2)
    assert spark.read.parquet(dst).count() == 10
