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
    # every PDF fails (a PDF is not an image; the extraction kernel
    # routes those to ocr/pdf.py), plus the one corrupt png fixture
    n_pdfs = len([r for r in feats if r.media_kind == "application/pdf"])
    assert len(ok) == len(feats) - n_pdfs - 1
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


def test_kind_coverage_contract(spark):
    """The stub-vs-real contract documented in COVERAGE.md: image/png
    and image/jpeg (ocr/jpeg.py baseline codec) decode for real — a
    corrupt file is ok=False with the decode error; audio/video kinds
    surface ok=False with the marked stub error instead of crashing
    the Arrow batch."""
    import numpy as np

    from pero_ocr_api_spark.ocr import jpeg
    from pero_ocr_api_spark.sources.tables import MEDIA_SCHEMA

    real_png = png.encode_gray(np.full((8, 8), 200, dtype=np.uint8))
    real_jpeg = jpeg.encode_gray(np.full((8, 8), 200, dtype=np.uint8))
    rows = [
        ("m_png", "image/png", bytearray(real_png), None),
        ("m_jpeg", "image/jpeg", bytearray(real_jpeg), None),
        ("m_jpeg_bad", "image/jpeg", bytearray(b"\xff\xd8\xff\xe0"), None),
        ("m_wav", "audio/wav", bytearray(b"RIFF0000WAVE"), None),
        ("m_mp4", "video/mp4", bytearray(b"\x00\x00\x00 ftypmp42"), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_ref: r for r in multimodal.image_features(media).collect()}
    assert got["m_png"].ok and got["m_png"].width == 8
    assert got["m_jpeg"].ok and got["m_jpeg"].width == 8
    assert not got["m_jpeg_bad"].ok
    for stubbed in ("m_wav", "m_mp4"):
        assert not got[stubbed].ok
        assert "no decoder" in got[stubbed].error


def test_no_shuffle_in_plan(spark, media_df):
    """The multimodal kernels must be shuffle-free map-only plans."""
    plan = multimodal.image_features(media_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
