"""Streaming ingest: the reference is batch-only (SURVEY.md §2.11 — nightly
delta files merged and committed; Solr autoCommit is a durability
micro-batch, not event-time processing). The faithful Spark shape is
therefore ``Trigger.AvailableNow`` over the same batch logic: drain
whatever landed, run extraction + profiling, append, checkpoint, stop.
Watermarks/stateful operators are deliberately absent — nothing in the
reference maps to them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import WEB_PAGES_SCHEMA
from ..functions.textstats import lang_id_expr, quality_score_expr, token_count
from ..sources.html import extract_text_udf


def stream_ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all parquet files from source_dir into target_dir, running the
    extraction + text-profile stage per micro-batch. Incremental: files
    already checkpointed are skipped on the next invocation (the analog of
    the reference's restartable incremental scripts).

    Blocks until the AvailableNow drain completes.
    """
    stream = (
        spark.readStream.schema(WEB_PAGES_SCHEMA).parquet(source_dir)
    )
    enriched = (
        stream.withColumn("extracted_text", extract_text_udf()(F.col("html")))
        .withColumn("n_tokens", token_count("text"))
        .withColumn("lang_guess", lang_id_expr("text"))
        .withColumn("quality", quality_score_expr("text"))
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_ingested(spark: SparkSession, target_dir: str) -> DataFrame:
    return spark.read.parquet(target_dir)
