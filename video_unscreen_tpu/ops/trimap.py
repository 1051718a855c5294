"""Trimap generation — morphology band + chroma ensemble.

TPU-native rebuild of `unscreen/trimap/agent.py`. Pure functions; the
resize-to-long-side plumbing lives in agents/trimap.py where the target
shape is resolved statically per clip.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from .morphology import dilate, erode
from .compositing import is_pixel_inrange


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def generate_trimap(mask: jax.Array, kernelsize: int = 3,
                    iters: int = 5,
                    use_pallas: bool | None = None) -> jax.Array:
    """Mask -> {0, 128, 255} trimap: unknown = dilate - erode band.

    Equivalent of `unscreen/trimap/agent.py:35-61` at the working
    resolution (the reference resizes to long side 960 around this core).
    On TPU the dilate/erode chain + selects run as one VMEM-resident
    Pallas pass (`ops/pallas/morph.py` — bit-exact, gated in tests);
    other backends keep the XLA shifted-max path.
    """
    if use_pallas is None:
        from .morphology import _use_pallas_morph
        use_pallas = _use_pallas_morph(mask)
    if use_pallas:
        from .pallas.morph import pallas_trimap
        return pallas_trimap(mask, kernelsize, iters).astype(mask.dtype)
    dilated = dilate(mask, kernelsize, iters)
    eroded = erode(mask, kernelsize, iters)
    trimap = jnp.full(mask.shape, 128.0, mask.dtype)
    trimap = jnp.where(eroded > 127, 255.0, trimap)
    trimap = jnp.where(dilated < 128, 0.0, trimap)
    return trimap


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def generate_trimap_withbg(mask: jax.Array, img: jax.Array, bg: jax.Array,
                           kernelsize: int = 3, iters: int = 5,
                           color_winsize: Sequence[int] = (10, 100, 180)
                           ) -> jax.Array:
    """Trimap ensembled with a chroma background mask.

    Pixels of `img` inside the HSV window around the background color are
    "fuzzy"; when the fuzzy area is consistent with the mask (<=10% overlap)
    it is zeroed from the mask and marked unknown in the trimap; otherwise
    fall back to the mask-only trimap. Empty masks pass through unchanged.
    Equivalent of `unscreen/trimap/agent.py:63-101`, with the data-dependent
    branch folded into selects so one compiled program serves every frame.
    """
    fg = mask > 0
    fg_count = fg.sum()
    bgmask = is_pixel_inrange(img, bg, color_winsize)
    fuzzy = fg & bgmask
    fallback = fuzzy.sum() / jnp.maximum(fg_count, 1) > 0.1

    ensembled = jnp.where(~fallback & fuzzy, 0.0, mask)
    trimap = generate_trimap(ensembled, kernelsize, iters)
    trimap = jnp.where(~fallback & fuzzy, 128.0, trimap)
    return jnp.where(fg_count == 0, mask, trimap)
