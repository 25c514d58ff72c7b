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


def test_stream_near_dedup(spark):
    """Simhash near-dup suppression: a lightly-edited re-crawl (same
    vocabulary, tiny edit) collapses to the original's signature and
    is dropped; genuinely different docs survive."""
    from pero_ocr_api_spark.streaming.pipeline import stream_near_dedup

    d = tempfile.mkdtemp()
    schema = "doc_id string, ts timestamp, text string"
    base = (
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards brew black quartz potions at dawn in the old tower"
    )
    spark.createDataFrame(
        [
            ("a", T0, base),
            # near-dup: same token multiset, reordered tail — simhash is
            # order-free over distinct tokens, so signature is identical
            ("a_near", T0 + timedelta(seconds=5), base + " the"),
            ("b", T0 + timedelta(seconds=6), "completely different text about spark physical plans and shuffle exchanges"),
        ],
        schema,
    ).coalesce(1).write.parquet(f"{d}/in")

    sq = (
        stream_near_dedup(spark, f"{d}/in", watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("near_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(240)
    rows = {r.doc_id: r.simhash for r in spark.sql("select * from near_dedup_out").collect()}
    assert "a" in rows and "b" in rows
    assert "a_near" not in rows  # identical signature within watermark
    assert rows["a"] != rows["b"]
