"""BackgroundAgent — background inpainting behind the foreground mask.

TPU-native rebuild of `unscreen/bgmodel/agent.py`. Three methods:
- `mean`: boundary-band mean color (one masked reduction).
- `pcov`: iterated box-filter partial convolution; the reference loops
  cv2.boxFilter up to 100x on the host (`agent.py:97-132`) — here it is a
  `lax.while_loop` of fused box filters, exiting when the hole is filled.
- `rf` (default): Laplacian regionfill of the V channel + mean H/S
  (`agent.py:134-157`), using the CG solver in `ops/regionfill.py`.
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
from ..ops.regionfill import regionfill


class BackgroundAgent:
    """Same surface as `unscreen/bgmodel/agent.py:52-208`."""

    def __init__(self,
                 input_long_side: int = 540,
                 dilation_ksize: int = 5,
                 dilation_iters: int = 3,
                 boundary_ksize: int = 7,
                 boundary_iters: int = 10,
                 pcov_ksize: int = 5):
        self.input_long_side = int(input_long_side)
        self.dilation_ksize = int(dilation_ksize)
        self.dilation_iters = int(dilation_iters)
        self.boundary_ksize = int(boundary_ksize)
        self.boundary_iters = int(boundary_iters)
        self.pcov_ksize = int(pcov_ksize)

    # -- device cores -------------------------------------------------------
    def _mean_bg_color(self, img_hsv, mask):
        """Boundary-band mean color in HSV (`agent.py:66-95`)."""
        boundary = morph.get_outer_boundary(mask, self.boundary_ksize,
                                            self.boundary_iters) > 0
        cnt = boundary.sum()
        band_mean = (img_hsv * boundary[..., None].astype(jnp.float32)
                     ).sum((0, 1)) / jnp.maximum(cnt, 1)
        global_mean = img_hsv.mean((0, 1))
        return jnp.where(cnt == 0, global_mean, band_mean)

    @functools.partial(jax.jit, static_argnums=(0,))
    def device_mean(self, img: jax.Array, mask: jax.Array) -> jax.Array:
        img_hsv = colorops.bgr2hsv(img)
        dmask = morph.dilate(mask, self.dilation_ksize, self.dilation_iters)
        color = self._mean_bg_color(img_hsv, dmask)
        bg = colorops.hsv2bgr(jnp.broadcast_to(color, img.shape))
        a = (dmask / 255.0)[..., None]
        return a * bg + (1.0 - a) * img  # fuse_fgbg (visualize.py:7-24)

    @functools.partial(jax.jit, static_argnums=(0,))
    def device_pcov(self, img: jax.Array, mask: jax.Array) -> jax.Array:
        """Partial-convolution fill (`agent.py:97-132`), full-frame.

        The reference restricts to the fg bbox for host speed; on TPU the
        full-frame box filters are cheaper than dynamic shapes.
        """
        dmask = morph.dilate(mask, self.dilation_ksize, self.dilation_iters)
        hole = dmask > 0
        bg = jnp.where(hole[..., None], 0.0, img)
        count = (~hole).astype(jnp.float32)
        total = float(mask.shape[0] * mask.shape[1])

        def cond(state):
            bg, count, it = state
            return (count.sum() < total) & (it < 100)

        def body(state):
            bg, count, it = state
            bg_f = morph.box_filter(bg, self.pcov_ksize)
            cnt_f = morph.box_filter(count, self.pcov_ksize)
            filled = cnt_f > 0
            bg = jnp.where(filled[..., None],
                           jnp.clip(bg_f / jnp.maximum(cnt_f, 1e-6)[..., None],
                                    0, 255), bg)
            return bg, filled.astype(jnp.float32), it + 1

        bg, _, _ = jax.lax.while_loop(cond, body, (bg, count, 0))
        a = (dmask / 255.0)[..., None]
        return a * bg + (1.0 - a) * img

    @functools.partial(jax.jit, static_argnums=(0,))
    def device_rf(self, img: jax.Array, mask: jax.Array) -> jax.Array:
        """Regionfill V channel + mean H/S (`agent.py:134-157`)."""
        img_hsv = colorops.bgr2hsv(img)
        dmask = morph.dilate(mask, self.dilation_ksize, self.dilation_iters)
        color = self._mean_bg_color(img_hsv, dmask)
        v_filled = regionfill(img_hsv[..., 2], dmask, 0.5)
        hole = (dmask > 0)[..., None]
        bg_hsv = jnp.where(hole, color, img_hsv)
        bg_hsv = bg_hsv.at[..., 2].set(
            jnp.where(dmask > 0, v_filled, img_hsv[..., 2]))
        return colorops.hsv2bgr(bg_hsv)

    # -- host API -----------------------------------------------------------
    def forward(self, img: np.ndarray, mask: np.ndarray,
                method: str = "rf") -> np.ndarray:
        mask_np = np.asarray(mask)
        if (mask_np == 0).sum() == 0:  # no background (`agent.py:178-179`)
            return np.zeros(np.asarray(img).shape)
        if mask_np.sum() == 0:  # no foreground (`agent.py:181-182`)
            return np.asarray(img)
        ori_h, ori_w = mask_np.shape
        th, tw = get_target_size(ori_h, ori_w, self.input_long_side)
        img_d = resize(jnp.asarray(img, jnp.float32), (th, tw))
        mask_d = resize(jnp.asarray(mask_np, jnp.float32), (th, tw))
        fn = {"mean": self.device_mean, "pcov": self.device_pcov,
              "rf": self.device_rf}.get(method)
        if fn is None:
            raise NameError(
                f"No such method for background inpainting: {method}")
        bg = fn(img_d, mask_d)
        bg = resize(bg, (ori_h, ori_w))
        return np.asarray(bg).clip(0, 255).astype(np.uint8)
