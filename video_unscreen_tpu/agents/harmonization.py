"""HarmonizationAgent — composite harmonization toolkit.

TPU-native rebuild of `unscreen/harmonization/agent.py`: Lab-space
foreground toning plus reduced-resolution box-filter smoothing/blurring.
Library capability for the person-replacement application (no in-repo
driver wires it, mirroring the reference).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import color as colorops
from ..ops import morphology as morph
from ..ops.geometry import get_target_size, resize


def _lab2bgr(lab: jax.Array) -> jax.Array:
    """Inverse of ops.color.bgr2lab (cv2 8-bit ranges, sRGB gamma)."""
    l_ = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (l_ + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        return jnp.where(t > 0.2068966, t ** 3, (t - 16.0 / 116.0) / 7.787)

    y = jnp.where(l_ > 8.0, fy ** 3, l_ / 903.3)
    x = finv(fx) * 0.950456
    z = finv(fz) * 1.088754
    xyz = jnp.stack([x, y, z], -1)
    m = jnp.array([[3.240479, -1.537150, -0.498535],
                   [-0.969256, 1.875992, 0.041556],
                   [0.055648, -0.204043, 1.057311]], jnp.float32)
    rgb = xyz @ m.T
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(rgb > 0.0031308, 1.055 * rgb ** (1 / 2.4) - 0.055,
                    rgb * 12.92)
    return jnp.clip(rgb[..., ::-1] * 255.0, 0.0, 255.0)


class HarmonizationAgent:
    """Same surface as `unscreen/harmonization/agent.py:7-113`."""

    def __init__(self):
        pass

    # -- device cores -------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def device_foreground_toning(self, fg, bg, alpha,
                                 toning_ratio=(0.5, 0.05, 0.05),
                                 max_shift=15.0, min_shift=-30.0):
        """Shift fg Lab means toward bg means (`agent.py:39-76`)."""
        fg_lab = colorops.bgr2lab(fg)
        bg_lab = colorops.bgr2lab(bg)
        sel = (alpha > 0)[..., None].astype(jnp.float32)
        fg_means = (fg_lab * sel).sum((0, 1)) / jnp.maximum(sel.sum(), 1)
        bg_means = bg_lab.mean((0, 1))
        shift = jnp.asarray(toning_ratio) * (bg_means - fg_means)
        shift = jnp.clip(shift, min_shift, max_shift)
        fg_lab = jnp.clip(fg_lab + shift, 0.0, 255.0)
        return _lab2bgr(fg_lab)

    @functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
    def device_smooth(self, img, iters: int, ksize: int,
                      work_hw: Tuple[int, int]):
        """Repeated box filter at reduced resolution (`agent.py:78-113`)."""
        ori_hw = img.shape[:2]
        small = resize(img, work_hw)
        for _ in range(iters):
            small = morph.box_filter(small, ksize)
        return resize(small, ori_hw)

    # -- host API -----------------------------------------------------------
    def blur_work_hw(self, h: int, w: int,
                     target_long_side: int = 480) -> Tuple[int, int]:
        """Reduced blur resolution (`agent.py:96-100` work geometry) — for
        callers composing `device_smooth` into larger device programs."""
        return get_target_size(h, w, target_long_side)

    def get_means(self, img, mask=None, target_long_side=240):
        h, w = img.shape[:2]
        th, tw = get_target_size(h, w, target_long_side)
        small = resize(jnp.asarray(img, jnp.float32), (th, tw))
        if mask is None:
            return np.asarray(small.mean((0, 1)))
        m = resize(jnp.asarray(mask, jnp.float32) * 255.0, (th, tw)) > 0
        sel = m[..., None].astype(jnp.float32)
        return np.asarray((small * sel).sum((0, 1))
                          / np.maximum(np.asarray(sel.sum()), 1))

    def foreground_toning(self, fg, bg, alpha, toning_ratio=(0.5, 0.05, 0.05),
                          max_shift=15, min_shift=-30):
        out = self.device_foreground_toning(
            jnp.asarray(fg, jnp.float32), jnp.asarray(bg, jnp.float32),
            jnp.asarray(alpha, jnp.float32), tuple(toning_ratio),
            float(max_shift), float(min_shift))
        return np.asarray(out).clip(0, 255).astype(np.uint8)

    def alpha_smoothing(self, alpha, iters=3, ksize=3, target_long_side=1920):
        h, w = alpha.shape[:2]
        work = get_target_size(h, w, target_long_side)
        out = self.device_smooth(jnp.asarray(alpha, jnp.float32), int(iters),
                                 int(ksize), work)
        return np.asarray(out).clip(0, 255).astype(np.uint8)

    def background_blurring(self, bg, iters=3, ksize=3, target_long_side=480):
        h, w = bg.shape[:2]
        work = get_target_size(h, w, target_long_side)
        out = self.device_smooth(jnp.asarray(bg, jnp.float32), int(iters),
                                 int(ksize), work)
        return np.asarray(out).clip(0, 255).astype(np.uint8)
