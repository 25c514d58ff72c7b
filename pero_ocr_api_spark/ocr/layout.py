"""Deterministic layout analysis: block detection + line segmentation.

From-scratch re-expression of the reference's layout-parser *stage*
(config ``[LAYOUT_PARSER] METHOD=LAYOUT_CNN, DOWNSAMPLE=4,
DETECTION_THRESHOLD=0.2, MAX_MEGAPIXELS=5`` — reference
``app/db/model.py:183-197``; the CNN itself lives in the external
pero_ocr package). Algorithm here:

1. binarize, max-pool by ``DOWNSAMPLE=4``;
2. recursive XY-cut on projection-profile gaps — horizontal cuts at
   gaps ≥ :data:`BLOCK_ROW_GAP` small-rows, vertical cuts at gaps ≥
   :data:`BLOCK_COL_GAP` small-cols (sized so inter-line and
   word-space gaps never split a block);
3. per block: text lines from full-resolution row projections;
4. per line: fixed-pitch glyph decode (:mod:`..ocr.glyphs`).

Emission order of the recursion (top-to-bottom bands, then
left-to-right) *is* the reading order — the X5 invariant.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pero_ocr_api_spark.ocr import glyphs

DOWNSAMPLE = 4
MAX_MEGAPIXELS = 5
# thresholds in downsampled units; see module docstring for sizing
BLOCK_ROW_GAP = 4  # 16 px: > inter-line gap (2*scale), < block gap (>=32 px)
BLOCK_COL_GAP = 9  # 36 px: > one space cell (6*scale=30 px at scale 5)


class LayoutError(ValueError):
    """Structural failure — maps to PROCESSING_FAILED."""


@dataclass
class Line:
    text: str
    confidence: float
    y0: int
    x0: int
    h: int
    w: int


@dataclass
class Block:
    y0: int
    x0: int
    y1: int  # exclusive
    x1: int  # exclusive
    lines: list[Line]


def _gap_runs(profile: np.ndarray, min_gap: int) -> list[tuple[int, int]]:
    """Segments of `profile` separated by >=min_gap consecutive zeros.

    Returns [start, stop) index pairs of the non-empty segments.
    ``min_gap`` must be >= 1 (a zero-run of at least that length splits).
    """
    nz = np.flatnonzero(profile)
    if nz.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(nz) > min_gap)
    starts = np.concatenate([[nz[0]], nz[breaks + 1]])
    stops = np.concatenate([nz[breaks] + 1, [nz[-1] + 1]])
    return list(zip(starts.tolist(), stops.tolist()))


def _xy_cut(small: np.ndarray, y0: int, x0: int, horizontal: bool) -> list[tuple[int, int, int, int]]:
    rows = small.any(axis=1)
    cols = small.any(axis=0)
    if not rows.any():
        return []
    if horizontal:
        segs = _gap_runs(rows, BLOCK_ROW_GAP)
        if len(segs) == 1:
            a, b = segs[0]
            sub = small[a:b]
            csegs = _gap_runs(sub.any(axis=0), BLOCK_COL_GAP)
            if len(csegs) == 1:
                c, d = csegs[0]
                return [(y0 + a, x0 + c, y0 + b, x0 + d)]
            out = []
            for c, d in csegs:
                out.extend(_xy_cut(sub[:, c:d], y0 + a, x0 + c, True))
            return out
        out = []
        for a, b in segs:
            out.extend(_xy_cut(small[a:b], y0 + a, x0, False))
        return out
    else:
        segs = _gap_runs(cols, BLOCK_COL_GAP)
        if len(segs) == 1:
            c, d = segs[0]
            sub = small[:, c:d]
            rsegs = _gap_runs(sub.any(axis=1), BLOCK_ROW_GAP)
            if len(rsegs) == 1:
                a, b = rsegs[0]
                return [(y0 + a, x0 + c, y0 + b, x0 + d)]
            out = []
            for a, b in rsegs:
                out.extend(_xy_cut(sub[a:b], y0 + a, x0 + c, False))
            return out
        out = []
        for c, d in segs:
            out.extend(_xy_cut(small[:, c:d], y0, x0 + c, True))
        return out


def _pool_ink(gray: np.ndarray, k: int) -> np.ndarray:
    """Downsampled ink mask: min-pool the gray image then threshold —
    identical to max-pooling the binarized image, without
    materializing a full-resolution bool plane (one less full-image
    pass; the kernel is memory-bandwidth-bound)."""
    h, w = gray.shape
    ph = (k - h % k) % k
    pw = (k - w % k) % k
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), constant_values=255)
    # pairwise np.minimum over k strided views instead of reshape +
    # min-reduce: ufunc minimum on row-contiguous views SIMD-vectorizes
    # where the uint8 axis-reduce does not (measured 4.6x on a typical
    # page — this is the kernel's hottest full-image pass). Identical
    # values: min over the same k-row / k-col groups.
    rows = gray[0::k]
    for i in range(1, k):
        rows = np.minimum(rows, gray[i::k])
    pooled = rows[:, 0::k]
    for i in range(1, k):
        pooled = np.minimum(pooled, rows[:, i::k])
    return pooled < glyphs.BINARIZE_THRESHOLD


def analyze_page(gray: np.ndarray, scale: int) -> list[Block]:
    """Full layout + OCR over one decoded grayscale page."""
    if gray.size > MAX_MEGAPIXELS * 1_000_000:
        raise LayoutError(
            f"image over {MAX_MEGAPIXELS} MP: {gray.shape}"
        )
    small = _pool_ink(gray, DOWNSAMPLE)
    blocks: list[Block] = []
    for sy0, sx0, sy1, sx1 in _xy_cut(small, 0, 0, True):
        # map back to full res and tighten to the exact ink bbox;
        # binarize lazily per region (block crops are small vs page)
        fy0, fx0 = sy0 * DOWNSAMPLE, sx0 * DOWNSAMPLE
        fy1 = min(sy1 * DOWNSAMPLE, gray.shape[0])
        fx1 = min(sx1 * DOWNSAMPLE, gray.shape[1])
        # ink profiles via min-reductions: a row/col has ink iff its
        # min gray < threshold — two read passes, no materialized
        # full-res bool plane (the kernel is memory-bandwidth-bound)
        g = gray[fy0:fy1, fx0:fx1]
        row_ink = g.min(axis=1) < glyphs.BINARIZE_THRESHOLD
        rr = np.flatnonzero(row_ink)
        if rr.size == 0:
            continue
        cc = np.flatnonzero(g.min(axis=0) < glyphs.BINARIZE_THRESHOLD)
        by0, by1 = fy0 + rr[0], fy0 + rr[-1] + 1
        bx0, bx1 = fx0 + cc[0], fx0 + cc[-1] + 1
        block = Block(y0=by0, x0=bx0, y1=by1, x1=bx1, lines=[])
        # every row's ink lies within [cc0, cc1] by construction, so
        # the tightened-row profile equals the old region row profile
        brows = row_ink[rr[0] : rr[-1] + 1]
        for ly0, ly1 in _gap_runs(brows, 1):
            h = ly1 - ly0
            if h != glyphs.GLYPH_H * scale:
                raise LayoutError(
                    f"line height {h} != {glyphs.GLYPH_H * scale} "
                    f"(block at y={by0},x={bx0})"
                )
            line_gray = gray[by0 + ly0 : by0 + ly1, bx0:bx1]
            text, conf = glyphs.decode_cells(line_gray, scale)
            block.lines.append(
                Line(
                    text=text,
                    confidence=conf,
                    y0=by0 + ly0,
                    x0=bx0,
                    h=h,
                    w=bx1 - bx0,
                )
            )
        blocks.append(block)
    return blocks
