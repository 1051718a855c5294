"""Morphology ops: ellipse-kernel dilate/erode, box filter, open/close.

TPU-native equivalents of the cv2 morphology the reference leans on
(`unscreen/utils/maskprocess.py:7-34,63-74`, boxFilter uses in
`unscreen/bgmodel/agent.py:97-132` and `unscreen/harmonization/agent.py:78-113`).

Design: grayscale dilation with an arbitrary 0/1 structuring element is a
max over the SE's shifted copies. The SE is tiny (k<=7 here), so we unroll
its offsets at trace time; XLA fuses the shifted-pad/max chain into a single
vectorized loop on the VPU. Iterated morphology unrolls `iters` times
(iters<=10 in all configs). Border semantics match cv2 defaults: dilation
treats outside as -inf, erosion as +inf (no border growth/shrink).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def ellipse_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k)) replica (host)."""
    r = (ksize - 1) // 2
    c = (ksize - 1) // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    kernel = np.zeros((ksize, ksize), np.uint8)
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1, j2 = max(c - dx, 0), min(c + dx + 1, ksize)
            kernel[i, j1:j2] = 1
    return kernel


def cross_kernel(ksize: int) -> np.ndarray:
    """cv2.MORPH_CROSS replica (host)."""
    kernel = np.zeros((ksize, ksize), np.uint8)
    kernel[ksize // 2, :] = 1
    kernel[:, ksize // 2] = 1
    return kernel


def _se_offsets(kernel: np.ndarray):
    """(dy, dx) offsets of the SE's active cells, relative to the anchor."""
    ky, kx = kernel.shape
    ay, ax = ky // 2, kx // 2
    return [(int(y) - ay, int(x) - ax) for y, x in np.argwhere(kernel > 0)]

def _shift2d(img: jax.Array, dy: int, dx: int, fill: float) -> jax.Array:
    """Shift a (H, W[, C]) image by (dy, dx), filling vacated cells."""
    h, w = img.shape[:2]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
    pad += [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, constant_values=fill)
    return jax.lax.slice(
        padded,
        (max(-dy, 0), max(-dx, 0)) + (0,) * (img.ndim - 2),
        (max(-dy, 0) + h, max(-dx, 0) + w) + img.shape[2:])


def _morph(img: jax.Array, offsets, iters: int, is_dilate: bool) -> jax.Array:
    fill = -jnp.inf if is_dilate else jnp.inf
    combine = jnp.maximum if is_dilate else jnp.minimum
    out = img
    for _ in range(iters):
        acc = out
        for (dy, dx) in offsets:
            if dy == 0 and dx == 0:
                continue
            # Shifting by (-dy, -dx) places the neighbor at (y+dy, x+dx)
            # under the anchor, i.e. out[y,x] = max over img[y+dy, x+dx].
            acc = combine(acc, _shift2d(out, -dy, -dx, fill))
        out = acc
    return out


def _use_pallas_morph(mask: jax.Array) -> bool:
    """TPU fast path guard: 2-D masks big enough that the VMEM kernel's
    dispatch beats XLA's shifted-max chain, small enough to sit whole in
    VMEM (`ops/pallas/morph.py`).

    The gate reads the PROCESS default backend, not the device the
    enclosing computation lowers for — code jitted for a non-default
    backend in a TPU process would still pick the Mosaic path. Fine for
    this framework (pipelines always run on the default backend), and the
    CPU suite's bit-exact gate runs the kernel interpreted only; the
    compiled Mosaic lowering is verified by the @pytest.mark.tpu parity
    tests in `tests/test_pallas_morph.py` (run on device with
    VU_TPU_TESTS=1)."""
    return (jax.default_backend() == "tpu" and mask.ndim == 2
            and 128 * 128 <= mask.size and mask.size * 4 <= (6 << 20))


@functools.partial(jax.jit, static_argnums=(1, 2))
def dilate(mask: jax.Array, kernelsize: int = 5, iters: int = 10) -> jax.Array:
    """Grayscale dilation with a cv2 ellipse kernel, iterated.

    Equivalent of `unscreen/utils/maskprocess.py:7-19`. On TPU, large
    2-D masks run the VMEM-resident Pallas chain (bit-exact, gated in
    `tests/test_pallas_morph.py`).
    """
    if _use_pallas_morph(mask):
        from .pallas.morph import pallas_dilate
        return pallas_dilate(mask, kernelsize, iters,
                             True).astype(mask.dtype)
    return _morph(mask, _se_offsets(ellipse_kernel(kernelsize)), iters, True)


@functools.partial(jax.jit, static_argnums=(1, 2))
def erode(mask: jax.Array, kernelsize: int = 5, iters: int = 10) -> jax.Array:
    """Grayscale erosion with a cv2 ellipse kernel, iterated.

    Equivalent of `unscreen/utils/maskprocess.py:22-34`.
    """
    if _use_pallas_morph(mask):
        from .pallas.morph import pallas_dilate
        return pallas_dilate(mask, kernelsize, iters,
                             False).astype(mask.dtype)
    return _morph(mask, _se_offsets(ellipse_kernel(kernelsize)), iters, False)


@functools.partial(jax.jit, static_argnums=(1, 2))
def morph_open(mask: jax.Array, kernelsize: int = 5, iters: int = 1) -> jax.Array:
    offsets = _se_offsets(ellipse_kernel(kernelsize))
    return _morph(_morph(mask, offsets, iters, False), offsets, iters, True)


@functools.partial(jax.jit, static_argnums=(1, 2))
def morph_close(mask: jax.Array, kernelsize: int = 5, iters: int = 1) -> jax.Array:
    offsets = _se_offsets(ellipse_kernel(kernelsize))
    return _morph(_morph(mask, offsets, iters, True), offsets, iters, False)


@functools.partial(jax.jit, static_argnums=(1, 2))
def get_outer_boundary(mask: jax.Array, kernelsize: int = 7,
                       iters: int = 10) -> jax.Array:
    """Dilate minus original, clipped — `unscreen/utils/maskprocess.py:63-74`."""
    return jnp.clip(dilate(mask, kernelsize, iters) - mask, 0.0, 255.0)


@functools.partial(jax.jit, static_argnums=(1,))
def box_filter(img: jax.Array, ksize: int) -> jax.Array:
    """Normalized k x k mean filter, REFLECT_101 border (cv2.boxFilter default).

    Separable: two 1-D window sums via reduce_window over a reflect-padded
    array, then scaled by 1/k^2.
    """
    lo = (ksize - 1) // 2
    hi = ksize - 1 - lo
    pad = [(lo, hi), (lo, hi)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="reflect")
    window = (ksize, 1) + (1,) * (img.ndim - 2)
    s = jax.lax.reduce_window(padded, 0.0, jax.lax.add, window,
                              (1,) * img.ndim, "valid")
    window = (1, ksize) + (1,) * (img.ndim - 2)
    s = jax.lax.reduce_window(s, 0.0, jax.lax.add, window,
                              (1,) * img.ndim, "valid")
    return s / float(ksize * ksize)
