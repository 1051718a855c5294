"""Laplacian membrane inpainting (regionfill) as a matrix-free CG solve.

The reference fills background holes by solving a sparse 4-neighbor Laplace
system with scipy spsolve on the host
(`unscreen/utils/region_fill.py:26-63`, duplicated in
`unscreen/bgmodel/region_fill.py`). TPU-native design: the system matrix is
a 4-neighbor stencil restricted to the hole — symmetric positive definite —
so we solve it with conjugate gradients where each matvec is four shifted
adds (pure VPU work, fuses into one kernel). No sparse assembly, no host
round-trip, shape-static.

System (matching the reference exactly):
  n_i x_i - sum_{j in hole, j~i} x_j = sum_{j in perimeter, j~i} I_j
with n_i = number of in-grid neighbors (4 interior / 3 edge / 2 corner) and
perimeter = cross-dilate(mask) & ~mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import resize
from .morphology import _shift2d, _morph, _se_offsets, cross_kernel


def _num_neighbors(h: int, w: int) -> np.ndarray:
    nn = np.full((h, w), 4.0, np.float32)
    nn[0, :] -= 1
    nn[-1, :] -= 1
    nn[:, 0] -= 1
    nn[:, -1] -= 1
    return nn


_SHIFTS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _neighbor_sum(x: jax.Array) -> jax.Array:
    out = jnp.zeros_like(x)
    for dy, dx in _SHIFTS:
        out = out + _shift2d(x, dy, dx, 0.0)
    return out


@functools.partial(jax.jit, static_argnums=(2, 3))
def _fill_core(img: jax.Array, hole: jax.Array, cg_iters: int,
               tol: float, x0: jax.Array | None = None) -> jax.Array:
    h, w = img.shape
    cross = _se_offsets(cross_kernel(3))
    dilated = _morph(hole.astype(jnp.float32), cross, 1, True)
    perimeter = (dilated > 0) & ~hole

    rhs = _neighbor_sum(jnp.where(perimeter, img, 0.0))
    rhs = jnp.where(hole, rhs, 0.0)
    nn = jnp.asarray(_num_neighbors(h, w))

    def matvec(x):
        x_in = jnp.where(hole, x, 0.0)
        ax = nn * x_in - _neighbor_sum(x_in)
        # Identity outside the hole keeps the operator full-rank on the grid
        # without coupling into the solve.
        return jnp.where(hole, ax, x)

    if x0 is None:
        x0 = jnp.zeros_like(img)
    else:
        # outside-hole entries of the identity block must start at rhs
        # (= 0) for the residual to measure only the hole system
        x0 = jnp.where(hole, x0, 0.0)
    sol, _ = jax.scipy.sparse.linalg.cg(matvec, rhs, x0=x0,
                                        tol=tol, maxiter=cg_iters)
    return jnp.where(hole, sol, img)


def solve_shape(h: int, w: int, factor: float = 1.0):
    """The (sh, sw) resolution `_fill_core` solves at for `factor`."""
    if factor == 1.0:
        return h, w
    return max(int(h * factor), 1), max(int(w * factor), 1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def regionfill_with_state(img: jax.Array, mask: jax.Array,
                          factor: float = 1.0, cg_iters: int = 400,
                          tol: float = 1e-5, x0: jax.Array | None = None):
    """`regionfill` that also returns the solve-resolution solution.

    `x0` (solve-res, from `solve_shape`) warm-starts the CG iteration —
    the fused bg pipeline threads the previous frame's solved background
    through the scan carry, so steady-state frames converge in a
    fraction of the cold-start iterations (backgrounds change slowly).
    """
    h, w = img.shape
    if factor != 1.0:
        sh, sw = solve_shape(h, w, factor)
        small = resize(img, (sh, sw))
        hole = resize(mask.astype(jnp.float32), (sh, sw)) > 0
        sol = _fill_core(small, hole, cg_iters, tol, x0)
        filled = resize(sol, (h, w))
    else:
        sol = _fill_core(img, mask > 0, cg_iters, tol, x0)
        filled = sol
    return jnp.where(mask > 0, filled, img), sol


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def regionfill(img: jax.Array, mask: jax.Array, factor: float = 1.0,
               cg_iters: int = 400, tol: float = 1e-5) -> jax.Array:
    """Fill `img` where `mask > 0` with a Laplacian membrane.

    Equivalent of `unscreen/utils/region_fill.py:7-17`: optional downscale by
    `factor` (static), solve, upsample, and restore known pixels. Empty masks
    pass through (the select keeps the original everywhere).
    """
    filled, _ = regionfill_with_state(img, mask, factor, cg_iters, tol)
    return filled
