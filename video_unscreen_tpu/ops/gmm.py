"""Batched 1-D Gaussian mixture models (weighted EM) for chroma filtering.

The reference fits six tiny 1-D GMMs per update — one per HSV channel for
each of {fg, bg} — with sklearn's EM on the host
(`unscreen/colorfiltering/agent.py:81-111,148-199`) and evaluates the
mixture pdf per pixel in torch (`agent.py:201-230`). TPU-native design:

- Fixed-size sample tensors: masked pixels are gathered into a static-length
  sample buffer with per-sample weights (weight 0 = padding), so the whole
  fit is shape-static and jittable.
- All six fits run as one `vmap`-ed weighted EM over a (6, K_max) component
  bank; channels with fewer components carry zero-weight padding components.
- Warm start = feed the previous `GMMParams` back in (the reference relies
  on sklearn's `warm_start=True`).
- The per-pixel mixture pdf evaluation is a (H*W, K) broadcast — pure VPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_VAR_FLOOR = 1e-3
_EPS = 1e-10


class GMMParams(NamedTuple):
    """One bank of 1-D GMMs. Leading axes = batch of models; last axis = K."""
    weights: jax.Array  # mixture weights, zero for padding components
    means: jax.Array
    variances: jax.Array


def gmm_init(n_models: int, k_max: int, active: jax.Array) -> GMMParams:
    """Uniform-weight init over the `active` component mask (n_models, k_max)."""
    act = active.astype(jnp.float32)
    w = act / jnp.maximum(act.sum(-1, keepdims=True), 1.0)
    means = jnp.broadcast_to(
        jnp.linspace(0.0, 255.0, k_max)[None, :], (n_models, k_max))
    var = jnp.full((n_models, k_max), 100.0)
    return GMMParams(w, means, var)


def _weighted_quantile_means(x, sw, k_max):
    """Spread initial means over the weighted sample distribution."""
    order = jnp.argsort(x)
    xs = x[order]
    ws = sw[order]
    cdf = jnp.cumsum(ws)
    cdf = cdf / jnp.maximum(cdf[-1], _EPS)
    qs = (jnp.arange(k_max) + 0.5) / k_max
    idx = jnp.searchsorted(cdf, qs)
    return xs[jnp.clip(idx, 0, x.shape[0] - 1)]


def _em_single(x, sw, params: GMMParams, active, iters: int) -> GMMParams:
    """Weighted EM for one 1-D GMM. x: (N,), sw: (N,) sample weights."""
    act = active.astype(jnp.float32)

    def log_pdf(means, variances):
        d = x[:, None] - means[None, :]
        return (-0.5 * d * d / variances[None, :]
                - 0.5 * jnp.log(2.0 * jnp.pi * variances[None, :]))

    def step(carry, _):
        w, m, v = carry
        logp = log_pdf(m, v) + jnp.log(jnp.maximum(w, _EPS))[None, :]
        logp = jnp.where(act[None, :] > 0, logp, -jnp.inf)
        resp = jax.nn.softmax(logp, axis=-1) * sw[:, None]
        nk = resp.sum(0)
        m_new = (resp * x[:, None]).sum(0) / jnp.maximum(nk, _EPS)
        d = x[:, None] - m_new[None, :]
        v_new = (resp * d * d).sum(0) / jnp.maximum(nk, _EPS) + _VAR_FLOOR
        w_new = nk / jnp.maximum(nk.sum(), _EPS)
        keep = act > 0
        return (jnp.where(keep, w_new, 0.0),
                jnp.where(keep, m_new, m),
                jnp.where(keep, v_new, 100.0)), None

    (w, m, v), _ = jax.lax.scan(step, (params.weights, params.means,
                                       params.variances), None, length=iters)
    return GMMParams(w, m, v)


@functools.partial(jax.jit, static_argnums=(4,))
def gmm_fit_em(x: jax.Array, sample_w: jax.Array, params: GMMParams,
               active: jax.Array, iters: int = 20) -> GMMParams:
    """Fit a bank of 1-D GMMs with weighted EM (warm-started from `params`).

    Args:
      x: (M, N) samples per model (padding allowed).
      sample_w: (M, N) sample weights; 0 marks padding samples.
      params: warm-start parameters, shapes (M, K).
      active: (M, K) bool mask of live components per model.
      iters: EM iterations (static).
    """
    return jax.vmap(_em_single, in_axes=(0, 0, 0, 0, None))(
        x, sample_w, params, active, iters)


@jax.jit
def gmm_cold_start(x: jax.Array, sample_w: jax.Array,
                   params: GMMParams, active: jax.Array) -> GMMParams:
    """Re-seed means from weighted sample quantiles (non-warm-start path)."""
    means = jax.vmap(_weighted_quantile_means, in_axes=(0, 0, None))(
        x, sample_w, params.means.shape[-1])
    var = jnp.full_like(params.variances, 100.0)
    act = active.astype(jnp.float32)
    w = act / jnp.maximum(act.sum(-1, keepdims=True), 1.0)
    return GMMParams(w, means, var)


@jax.jit
def gmm_pdf(params: GMMParams, x: jax.Array) -> jax.Array:
    """Mixture pdf of every model in the bank at points `x`.

    Args:
      params: shapes (M, K).
      x: (M, P) evaluation points (e.g. one row per HSV channel).
    Returns:
      (M, P) pdf values.
    """
    w, m, v = params
    d = x[:, :, None] - m[:, None, :]
    comp = jnp.exp(-0.5 * d * d / v[:, None, :]) / jnp.sqrt(
        2.0 * jnp.pi * v[:, None, :])
    return (comp * w[:, None, :]).sum(-1)
