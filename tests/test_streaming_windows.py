"""Event-time windowed aggregation with watermark (streaming/windows.py):
finalized windows match the batch plan exactly; late-but-inside-watermark
events are counted; the checkpoint carries open-window state across
AvailableNow drains.
"""

import datetime as dt

from pyspark.sql import functions as F

from marc_solr_profiling_spark.streaming.windows import (
    EVENTS_SCHEMA,
    stream_windowed_counts,
    windowed_counts_plan,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, minutes_after_T0, event_type, value)"""
    data = [
        (eid, T0 + dt.timedelta(minutes=m), eid % 7, etype, val, "{}")
        for (eid, m, etype, val) in rows
    ]
    return spark.createDataFrame(data, EVENTS_SCHEMA)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: events in hours 0 and 1, plus a head event at hour 4 that
    # pushes the watermark (2h delay) to hour 2 — finalizing hours 0-1
    batch1 = [
        (1, 5, "click", 1.0),
        (2, 20, "click", 2.0),
        (3, 30, "view", 1.5),
        (4, 70, "click", 1.0),
        (5, 4 * 60, "view", 9.0),   # watermark driver
    ]
    _events(spark, batch1).write.parquet(src, mode="overwrite")
    stream_windowed_counts(spark, src, dst, ckpt, watermark="2 hours")

    got1 = spark.read.parquet(dst)
    finalized_cutoff = T0 + dt.timedelta(hours=2)  # max(4h) - 2h
    expected1 = (
        windowed_counts_plan(_events(spark, batch1))
        .filter(F.col("win_end") <= F.lit(finalized_cutoff))
    )
    assert sorted(map(tuple, got1.collect())) \
        == sorted(map(tuple, expected1.collect()))
    # the hour-4 window itself is still open (inside the watermark)
    assert got1.filter(F.col("win_start") >= F.lit(finalized_cutoff)).count() == 0

    # batch 2 (a later drain over the SAME checkpoint): a LATE event for
    # hour 1... no — hour 1 is finalized; late event lands in hour 3
    # (still open), plus a new head at hour 8 that finalizes hours <= 6
    batch2 = [
        (6, 3 * 60 + 10, "click", 4.0),  # late vs the hour-4 head, inside watermark
        (7, 8 * 60, "click", 1.0),       # watermark -> hour 6
    ]
    _events(spark, batch2).write.mode("append").parquet(src)
    stream_windowed_counts(spark, src, dst, ckpt, watermark="2 hours")

    got2 = spark.read.parquet(dst)
    all_rows = batch1 + batch2
    cutoff2 = T0 + dt.timedelta(hours=6)
    expected2 = (
        windowed_counts_plan(_events(spark, all_rows))
        .filter(F.col("win_end") <= F.lit(cutoff2))
    )
    assert sorted(map(tuple, got2.collect())) \
        == sorted(map(tuple, expected2.collect()))
    # exactly-once per window: no duplicated (window, group) keys
    assert got2.count() \
        == got2.select("win_start", "event_type").distinct().count()


def test_sliding_windows(spark):
    rows = [(1, 0, "a", 1.0), (2, 45, "a", 1.0), (3, 75, "a", 1.0)]
    out = windowed_counts_plan(
        _events(spark, rows), window_dur="1 hour", slide="30 minutes"
    ).collect()
    # event at minute 45 belongs to windows [0:00,1:00) and [0:30,1:30)
    by_start = {r["win_start"]: r["n"] for r in out}
    assert by_start[T0] == 2
    assert by_start[T0 + dt.timedelta(minutes=30)] == 2
