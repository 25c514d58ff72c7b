"""Streaming exact dedup: first-seen doc per fingerprint survives,
in-watermark duplicates are dropped."""

from __future__ import annotations

import tempfile
from datetime import datetime, timedelta

from pero_ocr_api_spark.streaming.pipeline import stream_exact_dedup

T0 = datetime(2024, 1, 1, 0, 0, 0)


def test_stream_exact_dedup(spark):
    d = tempfile.mkdtemp()
    schema = "doc_id string, ts timestamp, text string"
    # batch 1: two originals + one duplicate (same text, later ts)
    spark.createDataFrame(
        [
            ("a", T0, "alpha beta gamma"),
            ("b", T0 + timedelta(seconds=1), "delta epsilon"),
            ("a_dup", T0 + timedelta(seconds=2), "Alpha  beta   GAMMA"),
        ],
        schema,
    ).coalesce(1).write.parquet(f"{d}/in")
    # batch 2: another duplicate of 'a' + a fresh doc
    spark.createDataFrame(
        [
            ("a_dup2", T0 + timedelta(seconds=30), "alpha beta gamma"),
            ("c", T0 + timedelta(seconds=31), "zeta eta theta"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(f"{d}/in")

    sq = (
        stream_exact_dedup(spark, f"{d}/in", watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(240)
    kept = {r.doc_id for r in spark.sql("select * from dedup_out").collect()}
    # normalization folds case/whitespace → a_dup and a_dup2 collapse on a
    assert "a" in kept and "b" in kept and "c" in kept
    assert "a_dup" not in kept and "a_dup2" not in kept
