"""Compositing math: chroma windows, fg/bg un-blending, color correction.

TPU-native rebuild of `unscreen/utils/fgfuncs.py` and the color_correct of
`unscreen/utils/imgprocess.py:263-300`. All math stays in the reference's
uint8-scale HSV/Lab conventions (see ops/color.py) so the pipeline constants
(window sizes, thresholds) are directly reusable.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .color import bgr2hsv, hsv2bgr, bgr2lab
from .geometry import resize, get_target_size


@jax.jit
def is_pixel_inrange(img: jax.Array, bg: jax.Array,
                     winsize: Sequence[int] = (20, 20, 120)) -> jax.Array:
    """Pixels of `img` within an HSV window around the background.

    `bg` may be a (H, W, 3) background image or a (3,) background color, both
    BGR 0..255. The window is (bg - winsize//2, bg + winsize//2) per HSV
    channel, thresholds clamped to (10, 255) to exclude black pixels.
    Equivalent of `unscreen/utils/fgfuncs.py:9-65`.

    Returns a (H, W) bool mask.
    """
    img_hsv = bgr2hsv(img)
    if bg.ndim == 1:
        bg_hsv = bgr2hsv(bg[None, None, :])[0, 0]
    else:
        bg_hsv = bgr2hsv(bg)
    half = jnp.asarray(winsize, jnp.float32) // 2
    lower = jnp.clip(bg_hsv - half, 10.0, 255.0)
    upper = jnp.clip(bg_hsv + half, 10.0, 255.0)
    ok = (img_hsv >= lower) & (img_hsv <= upper)
    return jnp.all(ok, axis=-1)


@jax.jit
def get_fg_naive(img: jax.Array, alpha: jax.Array) -> jax.Array:
    """fg = alpha * img — `unscreen/utils/fgfuncs.py:68-81`."""
    return img * (alpha / 255.0)[..., None]


@jax.jit
def get_fg(img: jax.Array, alpha: jax.Array, bg: jax.Array) -> jax.Array:
    """Un-blend `img = a*fg + (1-a)*bg` **in HSV space**, returning alpha*fg.

    The HSV-space subtraction (including the hue channel) is deliberate — it
    reproduces `unscreen/utils/fgfuncs.py:84-110` exactly.
    """
    img_hsv = bgr2hsv(img)
    bg_hsv = bgr2hsv(bg)
    a = (alpha / 255.0)[..., None]
    fg_hsv = jnp.clip(img_hsv - (1.0 - a) * bg_hsv, 0.0, 255.0)
    return hsv2bgr(fg_hsv)


@jax.jit
def get_bg(alpha: jax.Array, bg: jax.Array) -> jax.Array:
    """(1 - alpha) * bg in HSV space — `unscreen/utils/fgfuncs.py:113-137`."""
    bg_hsv = bgr2hsv(bg)
    a = (alpha / 255.0)[..., None]
    return hsv2bgr(jnp.clip((1.0 - a) * bg_hsv, 0.0, 255.0))


@jax.jit
def exist_foreground(mask: jax.Array, fg_exist_thr: float) -> jax.Array:
    """(mask >= 128).sum() > thr * h * w — `unscreen/utils/maskprocess.py:56-60`.

    Returns a scalar bool array (device-resident so the per-frame scan can
    branch on it with `lax.cond` without a host sync).
    """
    h, w = mask.shape
    return (mask >= 128).sum() > fg_exist_thr * h * w


@functools.partial(jax.jit, static_argnums=(3,))
def composite_fgbg(fg: jax.Array, alpha: jax.Array, bg: jax.Array,
                   extend: bool = False) -> jax.Array:
    """Composite fg over an aspect-fit-resized bg.

    Equivalent of `unscreen/utils/fgfuncs.py:172-214`: resize bg to cover the
    fg, alpha > 0.9 snapped to 1, composite at the bg center crop.
    """
    fg_h, fg_w = fg.shape[:2]
    bg_h, bg_w = bg.shape[:2]
    if float(fg_h) / fg_w > float(bg_h) / bg_w:
        new_bg_h = fg_h
        new_bg_w = int(float(bg_w) * new_bg_h / bg_h)
    else:
        new_bg_w = fg_w
        new_bg_h = int(float(bg_h) * new_bg_w / bg_w)
    bg_r = resize(bg, (new_bg_h, new_bg_w))
    left = max(new_bg_w // 2 - fg_w // 2, 0)
    top = max(new_bg_h // 2 - fg_h // 2, 0)
    bg_roi = jax.lax.dynamic_slice(bg_r, (top, left, 0), (fg_h, fg_w, 3))
    a = alpha / 255.0
    a = jnp.where(a > 0.9, 1.0, a)[..., None]
    comp = jnp.clip(fg + bg_roi * (1.0 - a), 0.0, 255.0)
    if extend:
        return jax.lax.dynamic_update_slice(bg_r, comp, (top, left, 0))
    return comp


@jax.jit
def get_mask(img: jax.Array):
    """Gray threshold-25 mask of a color image — `imgprocess.py:17-30`.

    Returns (mask 0/255 (H,W,1), binary mask 0/1 (H,W,1)).
    """
    from .color import bgr2gray
    gray = bgr2gray(img)
    thresh = jnp.where(gray > 25.0, 255.0, 0.0)
    return thresh[..., None], (thresh / 255.0)[..., None]


@functools.partial(jax.jit, static_argnums=(1,))
def get_fgbox(fgmask: jax.Array, padsize: int = 5):
    """Padded bounding box of the foreground — `maskprocess.py:37-53`.

    Returns (top, bottom, left, right) as device scalars (row/col ranges
    like the reference's np.where axis-0/axis-1 convention).
    """
    h, w = fgmask.shape
    rows = (fgmask > 0).any(axis=1)
    cols = (fgmask > 0).any(axis=0)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    top = jnp.min(jnp.where(rows, ridx, h))
    bottom = jnp.max(jnp.where(rows, ridx, -1))
    left = jnp.min(jnp.where(cols, cidx, w))
    right = jnp.max(jnp.where(cols, cidx, -1))
    return (jnp.maximum(top - padsize, 0), jnp.minimum(bottom + padsize, h),
            jnp.maximum(left - padsize, 0), jnp.minimum(right + padsize, w))


@jax.jit
def get_fg_with_colorremove(img: jax.Array, alpha: jax.Array, bg: jax.Array,
                            winsize=(10, 100, 120)) -> jax.Array:
    """Zero the alpha inside the chroma window, then un-blend —
    `fgfuncs.py:140-169`."""
    bg_mask = is_pixel_inrange(img, bg, winsize)
    alpha = jnp.where(bg_mask, 0.0, alpha)
    return get_fg(img, alpha, bg)


@functools.partial(jax.jit, static_argnums=(3, 4))
def color_correct(img: jax.Array, alpha: jax.Array, bg_color: jax.Array,
                  target_long_side: int = 960,
                  mean_exp: float = 0.95) -> jax.Array:
    """Suppress residual background tint in the alpha via Lab ab-distance.

    Equivalent of `unscreen/utils/imgprocess.py:263-300`: the Lab-space
    distance to the background color is min-max normalized, repeatedly
    sqrt-ed until the foreground mean reaches `mean_exp` (a
    `lax.while_loop`), zeroed outside the alpha, and multiplied in. The
    distance map is computed at `target_long_side` and resampled back with
    nearest interpolation (torch F.interpolate default in the reference).
    """
    h, w = img.shape[:2]
    th, tw = get_target_size(h, w, target_long_side)
    small = resize(img, (th, tw))
    lab = bgr2lab(small) / 255.0
    bg_lab = bgr2lab(bg_color[None, None, :])[0, 0] / 255.0
    dist = jnp.sqrt(((lab - bg_lab)[..., 1:] ** 2).sum(-1))
    dist = (dist - dist.min()) / jnp.maximum(dist.max() - dist.min(), 1e-8)
    alpha_s = resize(alpha, (th, tw))
    sel = (alpha_s > 0) & (dist > 0)

    def masked_mean(d):
        cnt = jnp.maximum(sel.sum(), 1)
        return jnp.where(sel, d, 0.0).sum() / cnt

    def cond(d):
        # NaN-free masked mean; empty selection exits immediately like the
        # reference's NaN comparison would.
        return (sel.sum() > 0) & (masked_mean(d) < mean_exp)

    dist = jax.lax.while_loop(cond, jnp.sqrt, dist)
    dist = jnp.where(alpha_s == 0, 0.0, dist)
    dist_full = resize(dist, (h, w), method="nearest")
    return alpha * dist_full
