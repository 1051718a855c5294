"""Color-space conversions matching OpenCV 8-bit conventions, on float arrays.

The reference pipeline does all chroma math in OpenCV uint8 HSV
(H in 0..180, S/V in 0..255) and uint8 Lab (L*255/100, a/b + 128) — e.g.
`unscreen/utils/fgfuncs.py:36,100-109` and `unscreen/utils/imgprocess.py:284-289`.
These jittable equivalents keep the same numeric ranges on float32 so the
downstream thresholds/windows (e.g. color_winsize (10,100,180)) carry over
unchanged. Golden-tested against cv2 in tests/test_color.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


@jax.jit
def bgr2rgb(img: jax.Array) -> jax.Array:
    return img[..., ::-1]


@jax.jit
def bgr2gray(img: jax.Array) -> jax.Array:
    """cv2.COLOR_BGR2GRAY: 0.299 R + 0.587 G + 0.114 B."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


@jax.jit
def bgr2hsv(img: jax.Array) -> jax.Array:
    """BGR(0..255) -> HSV with H in 0..180, S/V in 0..255 (cv2 8-bit ranges)."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    s = jnp.where(v > 0, 255.0 * c / jnp.maximum(v, _EPS), 0.0)
    # Hue in degrees, then halved into 0..180.
    h_r = 60.0 * (g - b) / jnp.maximum(c, _EPS)
    h_g = 120.0 + 60.0 * (b - r) / jnp.maximum(c, _EPS)
    h_b = 240.0 + 60.0 * (r - g) / jnp.maximum(c, _EPS)
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(c <= _EPS, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0
    return jnp.stack([h, s, v], axis=-1)


@jax.jit
def hsv2bgr(img: jax.Array) -> jax.Array:
    """HSV (H 0..180, S/V 0..255) -> BGR(0..255)."""
    h = img[..., 0] * 2.0  # degrees
    s = img[..., 1] / 255.0
    v = img[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, x, c, c, x])
    m = v - c
    return jnp.stack([b + m, g + m, r + m], axis=-1)


# sRGB(D65) -> XYZ matrix used by OpenCV's RGB2Lab (sRGB gamma applied first).
_RGB2XYZ = jnp.array([[0.412453, 0.357580, 0.180423],
                      [0.212671, 0.715160, 0.072169],
                      [0.019334, 0.119193, 0.950227]], jnp.float32)
_XN, _ZN = 0.950456, 1.088754


@jax.jit
def bgr2lab(img: jax.Array) -> jax.Array:
    """BGR(0..255) -> Lab in cv2 8-bit ranges (L*255/100, a/b offset +128)."""
    rgb = img[..., ::-1] / 255.0
    rgb = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4,
                    rgb / 12.92)
    xyz = rgb @ _RGB2XYZ.T
    x = xyz[..., 0] / _XN
    y = xyz[..., 1]
    z = xyz[..., 2] / _ZN

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    l_ = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (fx - fy) + 128.0
    b = 200.0 * (fy - fz) + 128.0
    return jnp.stack([l_ * 255.0 / 100.0, a, b], axis=-1)


def yuv420_to_bgr(yuv: jax.Array, out_hw=None) -> jax.Array:
    """Decode an I420 (YUV 4:2:0) plane stack to BGR float32 0..255.

    `yuv` is the (H*3/2, W) uint8 layout produced by
    `cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV_I420)`: H rows of Y, then the
    H/2 x W/2 U plane packed as H/4 rows, then V likewise. This is the
    pipeline wire format — production video decodes to 4:2:0 natively,
    and shipping it host->HBM halves transfer bytes vs packed BGR
    (SURVEY.md §2.4 streaming row; the tunnel link is the green-mode
    bottleneck). Coefficients are OpenCV's studio-swing BT.601.
    """
    hh = yuv.shape[0]
    h = (hh * 2) // 3
    w = yuv.shape[1]
    y = yuv[:h].astype(jnp.float32)
    u = yuv[h:h + h // 4].reshape(h // 2, w // 2).astype(jnp.float32)
    v = yuv[h + h // 4:].reshape(h // 2, w // 2).astype(jnp.float32)
    # chroma upsample x2 (nearest, matching cv2's I420 path)
    u = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1)
    v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1)
    c = (y - 16.0) * 1.164
    d = u - 128.0
    e = v - 128.0
    r = c + 1.596 * e
    g = c - 0.813 * e - 0.391 * d
    b = c + 2.018 * d
    return jnp.clip(jnp.stack([b, g, r], axis=-1), 0.0, 255.0)
