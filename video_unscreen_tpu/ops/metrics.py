"""Matting quality metrics: MIOU / SAD / MSE / GRAD / CONN (+ ROI SAD).

TPU-native rebuild of `unscreen/utils/metrics.py` — the scoring protocol of
`tools/eval.py`. All metrics are jittable so a whole clip can be scored in
one batched device call (the reference uses a 24-process host pool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .connected import connected_components
from .morphology import dilate, erode


@jax.jit
def miou(alpha: jax.Array, pred: jax.Array) -> jax.Array:
    """Mean of fg/bg IoU with the tiny-union guard.

    Equivalent of `unscreen/utils/metrics.py:8-50`.
    """
    h, w = alpha.shape

    def iou(a, p):
        inter = (a & p).sum()
        union = (a | p).sum()
        return jnp.where(union < h * w * 0.001, 1.0,
                         inter / jnp.maximum(union, 1))

    fg = iou(alpha > 127, pred > 127)
    bg = iou(alpha < 128, pred < 128)
    return (fg + bg) / 2.0


@jax.jit
def sad(alpha: jax.Array, pred: jax.Array) -> jax.Array:
    """Sum of absolute difference / 255, normalized by sqrt(h*w).

    Equivalent of `unscreen/utils/metrics.py:53-68`.
    """
    h, w = alpha.shape
    return jnp.abs((pred - alpha) / 255.0).sum() / jnp.sqrt(float(h * w))


@jax.jit
def roi_sad(alpha: jax.Array, pred: jax.Array) -> jax.Array:
    """SAD inside the GT boundary band (dilate XOR erode, k=5 x10).

    Equivalent of `unscreen/utils/metrics.py:71-92`.
    """
    roi = (dilate(alpha) > 0) ^ (erode(alpha) > 0)
    diff = jnp.abs((pred - alpha) / 255.0)
    return jnp.where(roi, diff, 0.0).sum() / jnp.maximum(roi.sum(), 1)


@jax.jit
def mse(alpha: jax.Array, pred: jax.Array) -> jax.Array:
    """Sum of squared difference on 0..1 alphas, / 1000.

    Equivalent of `unscreen/utils/metrics.py:95-99`.
    """
    d = (pred - alpha) / 255.0
    return (d * d).sum() / 1000.0


def _gauss_filter(sigma: float, epsilon: float = 1e-2) -> np.ndarray:
    """Host-built Gaussian-derivative filter (x direction), L2-normalized.

    Replica of `unscreen/utils/metrics.py:202-229`.
    """
    half = np.ceil(sigma * np.sqrt(-2 * np.log(np.sqrt(2 * np.pi) * sigma
                                               * epsilon)))
    size = int(2 * half + 1)
    i = np.arange(size) - half
    g = np.exp(-i ** 2 / (2 * sigma ** 2)) / (sigma * np.sqrt(2 * np.pi))
    dg = -i * g / sigma ** 2
    fx = g[:, None] * dg[None, :]
    return (fx / np.sqrt((fx ** 2).sum())).astype(np.float32)


def _conv2d_replicate(img: jax.Array, kern: jax.Array) -> jax.Array:
    kh, kw = kern.shape
    pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    padded = jnp.pad(img, pad, mode="edge")
    # cv2.filter2D is correlation, not convolution.
    return jax.lax.conv_general_dilated(
        padded[None, None], kern[None, None],
        window_strides=(1, 1), padding="VALID")[0, 0]


@functools.partial(jax.jit, static_argnums=(2,))
def gradient_error(alpha: jax.Array, pred: jax.Array,
                   sigma: float = 1.4) -> jax.Array:
    """Squared difference of Gaussian-derivative gradient magnitudes, / 1000.

    Equivalent of `unscreen/utils/metrics.py:102-123`.
    """
    fx = jnp.asarray(_gauss_filter(sigma))
    fy = fx.T

    def normed_grad(a):
        rng = jnp.maximum(a.max() - a.min(), 1e-8)
        a = (a - a.min()) / rng
        gx = _conv2d_replicate(a, fx)
        gy = _conv2d_replicate(a, fy)
        return jnp.sqrt(gx * gx + gy * gy)

    d = normed_grad(alpha) - normed_grad(pred)
    return (d * d).sum() / 1000.0


@functools.partial(jax.jit, static_argnums=(2,))
def connectivity_error(alpha: jax.Array, pred: jax.Array,
                       step: float = 0.1) -> jax.Array:
    """Connectivity error over thresholded largest connected components.

    Equivalent of `unscreen/utils/metrics.py:126-173`; the per-threshold
    largest 4-connected component uses the segmented-scan labeler instead of
    cv2.connectedComponentsWithStats.
    """
    a = alpha / 255.0
    p = pred / 255.0
    h, w = a.shape
    n_steps = int(round(1.0 / step))
    thresh = jnp.arange(1, n_steps + 2) * step  # matches arange(0,1+step,step)[1:]

    def body(i, round_down):
        t = thresh[i]
        inter = (a >= t) & (p >= t)
        lbl = connected_components(inter)
        flat = lbl.reshape(-1)
        area = jnp.zeros(h * w + 1, jnp.float32).at[flat].add(
            (flat > 0).astype(jnp.float32))
        area = area.at[0].set(0.0)
        biggest = jnp.argmax(area)
        omega = (lbl == biggest) & inter
        newly_off = (round_down == -1.0) & ~omega
        return jnp.where(newly_off, t - step, round_down)

    round_down = jax.lax.fori_loop(
        0, n_steps + 1, body, -jnp.ones_like(a))
    round_down = jnp.where(round_down == -1.0, 1.0, round_down)
    a_diff = a - round_down
    p_diff = p - round_down
    a_phi = 1.0 - a_diff * (a_diff >= 0.15)
    p_phi = 1.0 - p_diff * (p_diff >= 0.15)
    return jnp.abs(a_phi - p_phi).sum() / 1000.0
