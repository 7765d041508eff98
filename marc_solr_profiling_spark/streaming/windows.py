"""Event-time windowed aggregation with late-data watermarks — beyond the
reference (which is nightly-batch, see ingest.py), this is the streaming
operator a continuously-fed training-data pipeline needs: per-window
arrival counts/volumes that tolerate out-of-order events.

Semantics (standard Structured Streaming):

* ``withWatermark(ts, delay)`` bounds how late an event may arrive and
  still be counted; state for windows older than ``max(event_time) -
  delay`` is evicted.
* ``outputMode("append")`` emits a window ONLY once it is finalized
  (watermark passed its end) — so the parquet sink receives each window
  exactly once, which is what a downstream consumer of per-window stats
  wants. Windows still inside the watermark remain in state and are
  emitted by a later micro-batch (or the next ``AvailableNow`` drain —
  the checkpoint carries the state across runs).

Scale shape: the aggregation state is keyed on (window, group) — bounded
by (#groups x #open windows), independent of event volume; the shuffle is
the normal partial-agg groupBy. Skewed groups behave exactly as in batch
groupBy (AQE handles them); watermark eviction keeps state from growing
with stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_plan(
    events: DataFrame,
    window_dur: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """The aggregation itself, shared by the streaming and batch (oracle)
    paths: tumbling (or sliding, if ``slide`` given) event-time windows x
    group, with count and value sum."""
    win = (
        F.window(ts_col, window_dur, slide)
        if slide else F.window(ts_col, window_dur)
    )
    return (
        events.groupBy(win.alias("w"), F.col(group_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            group_col, "n", "value_sum",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    window_dur: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
    schema: str = EVENTS_SCHEMA,
) -> None:
    """Drain ``source_dir`` (parquet file stream) through an event-time
    windowed count with a late-data watermark, appending FINALIZED windows
    to ``target_dir``. ``Trigger.AvailableNow`` + checkpoint: repeated
    invocations resume exactly where the last drain stopped, and windows
    finalized by data that arrived between runs are emitted by the next
    run (ingest.py's incremental contract, extended with event time).

    Blocks until the drain completes.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_counts_plan(
        stream.withWatermark(ts_col, watermark),
        window_dur=window_dur, slide=slide,
        ts_col=ts_col, group_col=group_col,
    )
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
