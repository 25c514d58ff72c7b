"""Multimodal column operators: binary media + typed metadata.

Treats image/audio/video as opaque ``binary`` columns processed by
Arrow-batched ``mapInPandas`` kernels — the Spark-side plumbing
(schemas, batch iteration, per-partition init, failure capture) is
real and tested. The PNG path decodes for real via the stdlib codec;
audio/video codecs are absent from this container, so those decoders
are deterministic stubs behind explicit markers (per project policy),
with the same signature the real library call would have.

Scale: these kernels are the template for any per-blob transform at
100 TB — one Arrow hop, per-batch numpy work, no per-row Python, and
rows never leave their partition (no shuffle at all:
``.explain`` shows scan → project → MapInPandas)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pero_ocr_api_spark.ocr import png

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_brightness", T.DoubleType(), True),
        T.StructField("ink_ratio", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_bytes", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)


def _decode(media_kind: str | None, blob: bytes | None) -> np.ndarray:
    if blob is None:
        raise ValueError("null media bytes")
    if media_kind == "image/png":
        return png.decode_gray(bytes(blob))
    if media_kind == "image/jpeg":
        from pero_ocr_api_spark.ocr import jpeg

        return jpeg.decode_gray(bytes(blob))
    # STUB: remaining kinds (color JPEG, audio/video) require
    # Pillow/ffmpeg, absent in this container. The real implementation
    # plugs in here with the same (kind, bytes) -> ndarray contract.
    raise NotImplementedError(f"no decoder for {media_kind!r} in sandbox")


def image_features(media: DataFrame) -> DataFrame:
    """Per-image features (dims, brightness, ink ratio); failures are
    rows with ok=false, never task errors."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in FEATURE_SCHEMA.fields}
            for ref, kind, blob in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["media_bytes"]
            ):
                row = dict.fromkeys(out)
                row.update(media_ref=ref, media_kind=kind, ok=False)
                try:
                    img = _decode(kind, blob)
                    row.update(
                        width=img.shape[1],
                        height=img.shape[0],
                        mean_brightness=round(float(img.mean()), 4),
                        ink_ratio=round(float((img < 192).mean()), 6),
                        ok=True,
                    )
                except Exception as exc:  # noqa: BLE001 — per-row capture
                    row["error"] = f"{type(exc).__name__}: {exc}"
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.select("media_ref", "media_kind", "media_bytes").mapInPandas(
        fn, FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int) -> DataFrame:
    """Nearest-neighbor downscale so max(H,W) <= max_side, re-encoded;
    non-decodable rows pass through with null bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in RESIZE_SCHEMA.fields}
            for ref, kind, blob in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["media_bytes"]
            ):
                try:
                    img = _decode(kind, blob)
                    h, w = img.shape
                    s = max(h, w) / max_side
                    if s > 1:
                        ys = (np.arange(int(h / s)) * s).astype(int)
                        xs = (np.arange(int(w / s)) * s).astype(int)
                        img = img[np.ix_(ys, xs)]
                    out["media_ref"].append(ref)
                    out["media_bytes"].append(png.encode_gray(img))
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                except Exception:  # noqa: BLE001
                    out["media_ref"].append(ref)
                    out["media_bytes"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
            yield pd.DataFrame(out)

    return media.select("media_ref", "media_kind", "media_bytes").mapInPandas(
        fn, RESIZE_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video blobs. The ffmpeg probe/extract is
    stubbed (deterministic duration derived from blob length); the
    Spark-side shape — one input row fanning out to N frame rows inside
    the same partition — is the real pattern."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, tss = [], [], []
            for ref, kind, blob in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["media_bytes"]
            ):
                if blob is None or not str(kind).startswith("video/"):
                    continue
                # STUB: duration probe = len(bytes) µs stand-in
                duration_ms = len(blob)
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    refs.append(ref)
                    idxs.append(i)
                    tss.append(ts)
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "ts_ms": tss}
            )

    return media.select("media_ref", "media_kind", "media_bytes").mapInPandas(
        fn, FRAME_SCHEMA
    )
