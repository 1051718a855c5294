"""Visualization helpers (`unscreen/utils/visualize.py`)."""

from __future__ import annotations

import numpy as np


def fuse_fgbg(fg: np.ndarray, bg: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Alpha-blend fg over bg by `mask` (0..255) — `visualize.py:7-24`."""
    a = mask.astype(np.float32)[..., None] / 255.0
    out = a * fg.astype(np.float32) + (1.0 - a) * bg.astype(np.float32)
    return out.astype(np.uint8)


def highlight_roi(img: np.ndarray, mask: np.ndarray,
                  dim: float = 0.3) -> np.ndarray:
    """Dim everything outside the mask (`visualize.py:27-64` analog)."""
    a = (mask > 0).astype(np.float32)[..., None]
    out = img.astype(np.float32) * (a + (1 - a) * dim)
    return out.astype(np.uint8)
