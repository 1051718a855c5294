"""Chroma-prior segmentation core (shared by ChromaSegAgent and the fused
green pipeline)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .color import bgr2hsv
from .morphology import dilate, erode


def estimate_screen_color_hsv(img: jax.Array,
                              sat_thr: float = 60.0) -> jax.Array:
    """Dominant screen color in HSV via the H-histogram peak over
    saturated pixels (the color-prior observation of
    `unscreen/colorfiltering/agent.py:113-146`)."""
    hsv = bgr2hsv(img)
    h_ch, sat = hsv[..., 0], hsv[..., 1]
    bins = jnp.clip(h_ch.astype(jnp.int32), 0, 255).reshape(-1)
    weight = (sat > sat_thr).astype(jnp.float32).reshape(-1)
    hist = jnp.zeros(256, jnp.float32).at[bins].add(weight)
    peak = jnp.argmax(hist).astype(jnp.float32)
    sel = ((jnp.abs(h_ch - peak) < 8) & (sat > sat_thr)).astype(jnp.float32)
    cnt = jnp.maximum(sel.sum(), 1.0)
    s_mean = (hsv[..., 1] * sel).sum() / cnt
    v_mean = (hsv[..., 2] * sel).sum() / cnt
    return jnp.stack([peak, s_mean, v_mean])


def chroma_segment(img: jax.Array,
                   color_winsize: Sequence[int] = (24, 140, 240),
                   clean_iters: int = 2) -> Tuple[jax.Array, jax.Array]:
    """Foreground mask = NOT near the dominant screen color, cleaned by
    open/close morphology. Returns (mask 0/255, screen color HSV)."""
    hsv = bgr2hsv(img)
    bg_hsv = estimate_screen_color_hsv(img)
    half = jnp.asarray(color_winsize, jnp.float32) // 2
    lower = jnp.clip(bg_hsv - half, 10.0, 255.0)
    upper = jnp.clip(bg_hsv + half, 10.0, 255.0)
    is_bg = jnp.all((hsv >= lower) & (hsv <= upper), axis=-1)
    mask = jnp.where(is_bg, 0.0, 255.0)
    mask = dilate(erode(mask, 3, clean_iters), 3, clean_iters)
    mask = erode(dilate(mask, 3, clean_iters), 3, clean_iters)
    return mask, bg_hsv
