"""Synthetic page renderer for fixtures (FIXTURES.md §2).

Generates the deterministic page images whose ground truth drives the
golden span-equality tests — the analog of the reference's
``--test-mode`` golden-file mechanism (``run_client.py:36-37,229-235``).

Geometry contract (so :mod:`.layout` recovers the exact structure):
* blocks separated by >= :data:`MIN_BLOCK_GAP_Y` px vertically or
  >= :data:`MIN_BLOCK_GAP_X` px horizontally;
* lines within a block left-aligned at the block x, advanced by
  ``LINE_ADVANCE * scale`` px;
* text restricted to the glyph alphabet + single spaces.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pero_ocr_api_spark.ocr import glyphs

MIN_BLOCK_GAP_Y = 32
MIN_BLOCK_GAP_X = 48
MARGIN = 8


@dataclass
class BlockSpec:
    y: int
    x: int
    # (text, noise) per line
    lines: list[tuple[str, float]] = field(default_factory=list)


def render_page(
    blocks: list[BlockSpec], scale: int, seed: int
) -> tuple[np.ndarray, str]:
    """Render a page; returns (gray image, ground-truth text).

    Ground truth = lines in reading order (blocks as given — callers
    must pass them in XY-cut reading order), one line per row,
    ``\\n``-joined without trailing newline.
    """
    rng = np.random.RandomState(seed)
    h = w = 0
    for b in blocks:
        bh = len(b.lines) * glyphs.LINE_ADVANCE * scale
        bw = max((len(t) for t, _ in b.lines), default=0) * glyphs.PITCH * scale
        h = max(h, b.y + bh)
        w = max(w, b.x + bw)
    canvas = np.full((h + MARGIN, w + MARGIN), 255, dtype=np.uint8)
    truth: list[str] = []
    for b in blocks:
        for i, (text, noise) in enumerate(b.lines):
            img = glyphs.render_line(text, scale, noise, rng)
            y0 = b.y + i * glyphs.LINE_ADVANCE * scale
            canvas[y0 : y0 + img.shape[0], b.x : b.x + img.shape[1]] = np.minimum(
                canvas[y0 : y0 + img.shape[0], b.x : b.x + img.shape[1]], img
            )
            truth.append(text)
    return canvas, "\n".join(truth)
