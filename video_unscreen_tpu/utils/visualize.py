"""Visualization helpers (`unscreen/utils/visualize.py`).

Full API parity with the reference, headless-first: `show` falls back to
writing a file when no display is attached (TPU hosts are headless), and
`show_dist_hist` renders its histogram with cv2 drawing primitives — no
matplotlib dependency on the serving image.
"""

from __future__ import annotations

import os

import numpy as np


def fuse_fgbg(fg: np.ndarray, bg: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Alpha-blend fg over bg by `mask` (0..255) — `visualize.py:7-24`."""
    a = mask.astype(np.float32)[..., None] / 255.0
    out = a * fg.astype(np.float32) + (1.0 - a) * bg.astype(np.float32)
    return out.astype(np.uint8)


def get_roi(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Keep the ROI, black elsewhere (`visualize.py:27-45`)."""
    out = img.astype(np.float32) * (mask.astype(np.float32)[..., None] / 255.0)
    return out.astype(np.uint8)


def highlight_roi(img: np.ndarray, mask: np.ndarray,
                  ratio: float = 0.5) -> np.ndarray:
    """Cover the ROI with a red overlay (`visualize.py:48-65`): the last
    (red, BGR) channel is blended toward the mask inside the ROI."""
    out = img.copy()
    red = (ratio * out[:, :, -1].astype(np.float32)
           + (1.0 - ratio) * mask.astype(np.float32))
    out[:, :, -1] = np.where(mask == 0, img[:, :, -1],
                             red.astype(np.uint8))
    return out


def tocolor(img: np.ndarray) -> np.ndarray:
    """Grayscale -> BGR passthrough (`visualize.py:68-76`)."""
    if img.ndim == 2:
        import cv2
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    return img


def show(img: np.ndarray, downscale: int = 1,
         fallback_path: str = "/tmp/unscreen_show.png") -> str | None:
    """Show an image (`visualize.py:79-92`). On headless hosts (no
    $DISPLAY) the image is written to `fallback_path` instead; returns the
    path written, or None when an interactive window was used."""
    import cv2
    assert isinstance(downscale, int)
    if downscale != 1:
        h, w = img.shape[:2]
        img = cv2.resize(img, (w // downscale, h // downscale))
    if os.environ.get("DISPLAY"):
        cv2.imshow("result", img)
        cv2.waitKey()
        return None
    cv2.imwrite(fallback_path, img)
    return fallback_path


def show_dist_hist(samples: np.ndarray, num_hist: int = 20,
                   size: tuple = (320, 480),
                   fallback_path: str = "/tmp/unscreen_hist.png"
                   ) -> np.ndarray:
    """Histogram of samples in [0, 1] (`visualize.py:95-105`), rendered
    with cv2 bars instead of matplotlib. Returns the rendered BGR image
    (and displays/saves it via `show`)."""
    import cv2
    hist, _ = np.histogram(np.asarray(samples), num_hist, range=(0, 1))
    h, w = size
    canvas = np.full((h, w, 3), 255, np.uint8)
    peak = max(int(hist.max()), 1)
    bar_w = w // num_hist
    for i, count in enumerate(hist):
        bh = int((h - 20) * count / peak)
        x0 = i * bar_w + 1
        cv2.rectangle(canvas, (x0, h - 10 - bh),
                      (x0 + bar_w - 2, h - 10), (180, 90, 30), -1)
    show(canvas, fallback_path=fallback_path)
    return canvas
