"""Pallas VMEM-resident iterated morphology + fused trimap for TPU.

The trimap stage is `dilate(k,i)` + `erode(k,i)` + two selects
(`ops/trimap.py:generate_trimap`, reference `unscreen/trimap/agent.py:
35-61`). The XLA lowering of the unrolled shifted-max chain streams the
full image through HBM once per shift — 2 * iters * |SE| round trips
(40 at the green config's k=3, iters=5), measured 3.8 ms/frame at
960x544 (BASELINE.md budget). This kernel keeps the mask in VMEM and
performs every shift as a `pltpu.roll` + boundary select on the VPU, so
the whole dilate/erode chain plus the trimap selects costs one HBM
read + one write.

Shift semantics match `ops/morphology.py:_shift2d` exactly (dilation
ignores out-of-grid neighbors, erosion treats them as +inf — cv2
default border), and the structuring-element offsets come from the same
`ellipse_kernel`/`_se_offsets` host code, so `pallas_morph`/
`pallas_trimap` are bit-exact against the XLA path (gated in
`tests/test_pallas_morph.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ids(h, w, axis):
    return jax.lax.broadcasted_iota(jnp.int32, (h, w), axis)


def _shift_vmem(v, dy: int, dx: int, fill, hw):
    """out[y, x] = v[y + dy, x + dx] where inside the REAL (h, w) grid,
    else `fill`.

    `pltpu.roll` is circular with non-negative shifts only; wrapped
    lanes/sublanes are masked off by iota comparisons. The bounds use
    the pre-padding (h, w) — the tile-alignment pad rows/cols hold
    zeros, which would corrupt erosion (cv2's border is +inf there,
    `ops/morphology.py:_morph`), so shifts must never read them.
    """
    ph, pw = v.shape
    h, w = hw
    if dy:
        v = pltpu.roll(v, (-dy) % ph, 0)
        rows = _ids(ph, pw, 0)
        v = jnp.where((rows + dy >= 0) & (rows + dy < h), v, fill)
    if dx:
        v = pltpu.roll(v, (-dx) % pw, 1)
        cols = _ids(ph, pw, 1)
        v = jnp.where((cols + dx >= 0) & (cols + dx < w), v, fill)
    return v


def _morph_vmem(x, offsets, iters: int, is_dilate: bool, hw):
    """Iterated grayscale dilate/erode, all intermediates in VMEM.

    Mirrors `ops/morphology.py:_morph`: per iteration, combine the
    anchor with every non-center SE offset's shifted copy.
    """
    fill = jnp.float32(-jnp.inf) if is_dilate else jnp.float32(jnp.inf)
    combine = jnp.maximum if is_dilate else jnp.minimum
    out = x
    for _ in range(iters):
        acc = out
        for (dy, dx) in offsets:
            if dy == 0 and dx == 0:
                continue
            # anchor reads its (dy, dx) neighbor: out[y, x] =
            # combine over v[y + dy, x + dx] (`_morph`'s
            # `_shift2d(out, -dy, -dx)`)
            acc = combine(acc, _shift_vmem(out, dy, dx, fill, hw))
        out = acc
    return out


def _trimap_kernel(mask_ref, out_ref, *, offsets, iters, hw):
    x = mask_ref[:]
    dil = _morph_vmem(x, offsets, iters, True, hw)
    ero = _morph_vmem(x, offsets, iters, False, hw)
    tri = jnp.full_like(x, 128.0)
    tri = jnp.where(ero > 127.0, 255.0, tri)
    out_ref[:] = jnp.where(dil < 128.0, 0.0, tri)


def _morph_kernel(x_ref, out_ref, *, offsets, iters, is_dilate, hw):
    out_ref[:] = _morph_vmem(x_ref[:], offsets, iters, is_dilate, hw)


def _pad_to(x, mult_h=8, mult_w=128):
    h, w = x.shape
    ph, pw = (-h) % mult_h, (-w) % mult_w
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)))
    return x, (h, w)


def _se_offsets_static(kernelsize: int):
    from ..morphology import ellipse_kernel, _se_offsets
    return tuple(_se_offsets(ellipse_kernel(kernelsize)))


def _call(make_kernel, x, n_bufs: int, interpret: bool):
    xp, (h, w) = _pad_to(x.astype(jnp.float32))
    ph, pw = xp.shape
    kernel = make_kernel((h, w))
    # generous scoped-VMEM ask: ~n_bufs live (ph, pw) f32 values (the
    # chain's accumulator + shift temps), same accounting style as
    # `ops/pallas/flood.py`
    limit = ((ph * pw * 4 * n_bufs + (2 << 20)) // (1 << 20)) << 20
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(xp)
    return out[:h, :w]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pallas_trimap(mask: jax.Array, kernelsize: int = 3, iters: int = 5,
                  interpret: bool = False) -> jax.Array:
    """{0, 128, 255} trimap of `mask`, one VMEM pass (TPU fast path).

    Drop-in for `ops/trimap.py:generate_trimap` (reference
    `unscreen/trimap/agent.py:35-61`).
    """
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the kernel interpreted
    mk = lambda hw: functools.partial(
        _trimap_kernel, offsets=_se_offsets_static(kernelsize),
        iters=iters, hw=hw)
    return _call(mk, mask, n_bufs=8, interpret=interpret)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def pallas_dilate(mask: jax.Array, kernelsize: int = 5, iters: int = 10,
                  is_dilate: bool = True,
                  interpret: bool = False) -> jax.Array:
    """Iterated ellipse-SE dilate (or erode) in one VMEM pass.

    Drop-in for `ops/morphology.py:dilate`/`erode` on large masks.
    """
    if jax.default_backend() != "tpu":
        interpret = True
    mk = lambda hw: functools.partial(
        _morph_kernel, offsets=_se_offsets_static(kernelsize),
        iters=iters, is_dilate=is_dilate, hw=hw)
    return _call(mk, mask, n_bufs=6, interpret=interpret)
