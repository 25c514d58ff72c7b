"""Watermark windowed aggregation + applyInPandasWithState timeout."""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from pero_ocr_api_spark.streaming.pipeline import (
    stream_event_window_counts,
    stream_timeout_requeue,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def test_windowed_counts_with_watermark(spark):
    """Streaming windowed histogram == batch aggregate for every
    window closed under the final watermark."""
    d = tempfile.mkdtemp()
    rows = []
    for i in range(200):
        rows.append(
            (i, T0 + timedelta(minutes=i % 170), i % 7,
             ["click", "view", "error"][i % 3], float(i), None)
        )
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    events.repartition(4).write.parquet(f"{d}/events")

    sq = (
        stream_event_window_counts(spark, f"{d}/events")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(240)
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("select * from win_counts").collect()
    }
    # final watermark = max ts - 10 min → only the first window(s)
    # are guaranteed closed; every emitted window must match batch
    assert got, "no windows emitted"
    batch = {
        (r.w.start, r.event_type): r.n
        for r in events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for key, n in got.items():
        assert batch[key] == n, key


def test_stateful_timeout_requeue(spark):
    """U6 via applyInPandasWithState: a page stuck in PROCESSING
    longer than 60 s of event time is requeued once the watermark
    passes; completed pages are not."""
    d = tempfile.mkdtemp()
    schema = "page_id string, state string, ts timestamp"
    # file 1: p1 stuck, p2 completes quickly
    spark.createDataFrame(
        [
            ("p1", "PROCESSING", T0),
            ("p2", "PROCESSING", T0),
            ("p2", "PROCESSED", T0 + timedelta(seconds=10)),
        ],
        schema,
    ).coalesce(1).write.parquet(f"{d}/in")
    # files 2+3: heartbeats that push the watermark past p1's timeout
    spark.createDataFrame(
        [("hb", "PROCESSED", T0 + timedelta(seconds=300))], schema
    ).coalesce(1).write.mode("append").parquet(f"{d}/in")
    spark.createDataFrame(
        [("hb2", "PROCESSED", T0 + timedelta(seconds=400))], schema
    ).coalesce(1).write.mode("append").parquet(f"{d}/in")

    sq = (
        stream_timeout_requeue(spark, f"{d}/in")
        .writeStream.format("memory")
        .queryName("requeues")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(240)
    rows = spark.sql("select * from requeues").collect()
    requeued = {r.page_id: r for r in rows}
    assert "p1" in requeued, f"p1 not requeued: {rows}"
    assert requeued["p1"].action == "REQUEUE_WAITING"
    assert requeued["p1"].stuck_since == T0
    assert "p2" not in requeued


def test_stateful_timeout_survives_very_late_event(spark):
    """A PROCESSING event arriving after the watermark already passed
    its ts+60 s deadline must not kill the query (timeout clamps to
    just past the watermark) and must still be requeued by a later
    batch."""
    d = tempfile.mkdtemp()
    schema = "page_id string, state string, ts timestamp"
    # batch 1: heartbeat far in the future → watermark jumps to ~595 s
    spark.createDataFrame(
        [("hb1", "PROCESSED", T0 + timedelta(seconds=600))], schema
    ).coalesce(1).write.parquet(f"{d}/in")
    # batch 2: p_late's PROCESSING is >9 min late — ts+60 s is far
    # behind the watermark (unclamped this throws and kills the query)
    spark.createDataFrame(
        [("p_late", "PROCESSING", T0)], schema
    ).coalesce(1).write.mode("append").parquet(f"{d}/in")
    # batches 3+4: advance the watermark past the clamped deadline
    spark.createDataFrame(
        [("hb2", "PROCESSED", T0 + timedelta(seconds=700))], schema
    ).coalesce(1).write.mode("append").parquet(f"{d}/in")
    spark.createDataFrame(
        [("hb3", "PROCESSED", T0 + timedelta(seconds=800))], schema
    ).coalesce(1).write.mode("append").parquet(f"{d}/in")

    sq = (
        stream_timeout_requeue(spark, f"{d}/in")
        .writeStream.format("memory")
        .queryName("late_requeues")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(240)
    rows = spark.sql("select * from late_requeues").collect()
    requeued = {r.page_id: r for r in rows}
    assert "p_late" in requeued, f"late page not requeued: {rows}"
    assert requeued["p_late"].stuck_since == T0


def test_timeout_fn_terminal_wins_timestamp_tie():
    """Unit-level pin of the equal-ts semantics: a terminal event at
    the SAME ts as a PROCESSING must close the page (stable sort +
    terminal-after tie-break in _timeout_fn) — pandas' default
    unstable sort could otherwise flip the outcome run to run."""
    import pandas as pd

    from pero_ocr_api_spark.streaming.pipeline import _timeout_fn

    class FakeState:
        hasTimedOut = False

        def __init__(self):
            self.removed = False
            self.updated = None

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutTimestamp(self, ms):
            pass

        def getCurrentWatermarkMs(self):
            return 0

    ts = pd.Timestamp("2024-01-01 00:00:00")
    # terminal delivered FIRST in the batch, same ts as PROCESSING —
    # after the stable tie-break sort it must still count as closing
    events = pd.DataFrame(
        {
            "page_id": ["p1", "p1"],
            "state": ["PROCESSED", "PROCESSING"],
            "ts": [ts, ts],
        }
    )
    state = FakeState()
    out = list(_timeout_fn(("p1",), iter([events]), state))
    assert out == []
    assert state.removed, "terminal at equal ts must close the page"
    assert state.updated is None
