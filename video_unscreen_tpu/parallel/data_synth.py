"""Synthetic matting training data.

The reference ships pretrained weights and no training pipeline; this
framework trains its own matting net. Each sample is a composite of a
soft-edged foreground over a textured background with the exact input
contract of the green/bg pipelines: normalized RGB + previous-frame alpha
+ one-hot trimap, supervised by the GT alpha (loss lives on the unknown
band, `parallel/train.py`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import cv2
import numpy as np


def _smooth_noise(rng, h, w, scale=8):
    small = rng.rand(max(h // scale, 1), max(w // scale, 1), 3)
    return cv2.resize(small.astype(np.float32), (w, h),
                      interpolation=cv2.INTER_CUBIC).clip(0, 1)


def _random_alpha(rng, h, w):
    """Union of random ellipses, gaussian-soft edges."""
    alpha = np.zeros((h, w), np.float32)
    for _ in range(rng.randint(1, 4)):
        cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(
            w // 4, 3 * w // 4)
        ay, ax = rng.randint(h // 8, h // 3), rng.randint(w // 8, w // 3)
        ang = rng.randint(0, 180)
        cv2.ellipse(alpha, (cx, cy), (ax, ay), ang, 0, 360, 1.0, -1)
    k = rng.choice([3, 5, 7])
    return cv2.GaussianBlur(alpha, (k, k), 0).clip(0, 1)


def make_batch(rng: np.random.RandomState, batch: int,
               hw: Tuple[int, int] = (128, 128),
               imagenet_norm: bool = True) -> Dict[str, np.ndarray]:
    h, w = hw
    imgs, alpha_pres, trimaps, gts = [], [], [], []
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    for _ in range(batch):
        bg = _smooth_noise(rng, h, w)
        fg = _smooth_noise(rng, h, w, scale=4)
        alpha = _random_alpha(rng, h, w)
        img = alpha[..., None] * fg + (1 - alpha[..., None]) * bg
        img += rng.randn(h, w, 3).astype(np.float32) * 0.02
        img = img.clip(0, 1)

        # trimap from GT morphology band (like trimap/agent.py)
        hard = (alpha > 0.5).astype(np.uint8)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        iters = rng.randint(2, 6)
        dil = cv2.dilate(hard, kernel, iterations=iters)
        ero = cv2.erode(hard, kernel, iterations=iters)
        tri_cls = np.ones((h, w), np.int32)  # unknown
        tri_cls[ero > 0] = 2
        tri_cls[dil == 0] = 0
        trimap = np.eye(3, dtype=np.float32)[tri_cls]

        # previous-frame alpha: GT jittered (simulates temporal recurrence)
        shift = rng.randint(-3, 4, size=2)
        m = np.float32([[1, 0, shift[1]], [0, 1, shift[0]]])
        alpha_pre = cv2.warpAffine(alpha, m, (w, h))
        if rng.rand() < 0.2:
            alpha_pre = np.zeros_like(alpha)  # first frame of a clip

        rgb = img[..., ::-1]
        if imagenet_norm:
            rgb = (rgb - mean) / std
        imgs.append(rgb)
        alpha_pres.append(alpha_pre[..., None])
        trimaps.append(trimap)
        gts.append(alpha)
    return {
        "img": np.stack(imgs),
        "alpha_pre": np.stack(alpha_pres),
        "trimap": np.stack(trimaps),
        "alpha_gt": np.stack(gts),
    }
