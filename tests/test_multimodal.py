"""Multimodal mapInPandas plumbing over the fixture media table."""

from __future__ import annotations

from pyspark.sql import functions as F

from pero_ocr_api_spark.ocr import png
from pero_ocr_api_spark.operators import multimodal


def test_image_features(spark, media_df):
    feats = multimodal.image_features(media_df).collect()
    by_ref = {r.media_ref: r for r in feats}
    assert len(feats) == media_df.count()
    ok = [r for r in feats if r.ok]
    assert len(ok) >= len(feats) - 2  # corrupt png + fake pdf fail
    r = ok[0]
    assert r.width > 0 and r.height > 0
    assert 0 < r.mean_brightness <= 255
    assert 0 < r.ink_ratio < 0.5
    bad = [r for r in feats if not r.ok]
    assert all(r.error for r in bad)


def test_resize_roundtrip(spark, media_df):
    resized = multimodal.resize_images(media_df, max_side=128).collect()
    ok = [r for r in resized if r.media_bytes is not None]
    assert ok
    for r in ok[:5]:
        img = png.decode_gray(bytes(r.media_bytes))
        assert max(img.shape) <= 128
        assert img.shape == (r.height, r.width)


def test_sample_frames(spark):
    rows = [
        ("v1", "video/fake", b"\x00" * 3500, None),
        ("v2", "image/png", b"px", None),
        ("v3", "video/fake", None, None),
    ]
    from pero_ocr_api_spark.sources.tables import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    got = sorted((r.media_ref, r.frame_idx, r.ts_ms) for r in frames)
    assert got == [("v1", 0, 0), ("v1", 1, 1000), ("v1", 2, 2000), ("v1", 3, 3000)]


def test_no_shuffle_in_plan(spark, media_df):
    """The multimodal kernels must be shuffle-free map-only plans."""
    plan = multimodal.image_features(media_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
