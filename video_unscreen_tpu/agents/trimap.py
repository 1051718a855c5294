"""TrimapAgent — resize-wrapped trimap generation.

TPU-native rebuild of `unscreen/trimap/agent.py` (the device cores live in
`ops/trimap.py`). The reference resizes the mask to long side 960 with
NEAREST, generates the trimap there, then resizes back with a *linear*
resample (a positional-arg slip in `trimap/agent.py:59` passes
INTER_NEAREST as `dst`) and re-quantizes in-between values to 128; we
reproduce that quantization contract.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import get_target_size, resize
from ..ops.trimap import generate_trimap, generate_trimap_withbg


class TrimapAgent:
    """Same constructor/forward surface as `unscreen/trimap/agent.py:25-128`."""

    def __init__(self,
                 input_long_side: int = 960,
                 kernelsize: int = 3,
                 iters: int = 5,
                 color_winsize: Sequence[int] = (10, 100, 180)):
        self.input_long_side = int(input_long_side)
        self.kernelsize = int(kernelsize)
        self.iters = int(iters)
        self.color_winsize = tuple(int(v) for v in color_winsize)

    # -- device cores (work at a given static geometry) ---------------------
    @functools.partial(jax.jit, static_argnums=(0, 2))
    def device_generate(self, mask: jax.Array,
                        work_hw: Tuple[int, int]) -> jax.Array:
        """Mask-only trimap: NEAREST down, band morphology, linear up,
        re-quantize to {0, 128, 255} (`trimap/agent.py:35-61`)."""
        ori_hw = mask.shape
        small = resize(mask, work_hw, method="nearest")
        tri = generate_trimap(small, self.kernelsize, self.iters)
        tri = resize(tri, ori_hw)
        return jnp.where((tri > 0) & (tri < 255), 128.0, tri)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def device_generate_withbg(self, mask: jax.Array, img: jax.Array,
                               bg: jax.Array,
                               work_hw: Tuple[int, int]) -> jax.Array:
        """Chroma-ensembled trimap (`trimap/agent.py:63-101`).

        The fuzzy-area logic runs at full resolution (as in the reference);
        only the morphology band is computed at `work_hw`.
        """
        ori_hw = mask.shape
        from ..ops.compositing import is_pixel_inrange
        fg = mask > 0
        fg_count = fg.sum()
        bgmask = is_pixel_inrange(img, bg, self.color_winsize)
        fuzzy = fg & bgmask
        fallback = fuzzy.sum() / jnp.maximum(fg_count, 1) > 0.1

        ensembled = jnp.where(~fallback & fuzzy, 0.0, mask)
        small = resize(ensembled, work_hw, method="nearest")
        tri = generate_trimap(small, self.kernelsize, self.iters)
        tri = resize(tri, ori_hw)
        tri = jnp.where((tri > 0) & (tri < 255), 128.0, tri)
        tri = jnp.where(~fallback & fuzzy, 128.0, tri)
        return jnp.where(fg_count == 0, mask, tri)

    # -- host API -----------------------------------------------------------
    def _work_hw(self, h: int, w: int) -> Tuple[int, int]:
        return get_target_size(h, w, self.input_long_side)

    def generate_trimap(self, mask: np.ndarray) -> np.ndarray:
        h, w = mask.shape
        out = self.device_generate(jnp.asarray(mask, jnp.float32),
                                   self._work_hw(h, w))
        return np.asarray(out).astype(np.uint8)

    def generate_trimap_withbg(self, mask, img, bg) -> np.ndarray:
        h, w = mask.shape
        out = self.device_generate_withbg(
            jnp.asarray(mask, jnp.float32), jnp.asarray(img, jnp.float32),
            jnp.asarray(bg, jnp.float32), self._work_hw(h, w))
        return np.asarray(out).astype(np.uint8)

    def forward(self, *args):
        """Arity dispatch like `trimap/agent.py:103-128`."""
        if len(args) > 2:
            return self.generate_trimap_withbg(*args)
        return self.generate_trimap(*args)
