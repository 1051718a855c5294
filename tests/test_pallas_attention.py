"""Pallas flash attention kernel vs the einsum reference (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from video_unscreen_tpu.ops.pallas.attention import masked_memory_attention


def _reference(q, k, v, mask):
    s = (q @ k.T) / np.sqrt(q.shape[1])
    s = np.where(mask[None, :] > 0, s, -1e30)
    p = jax.nn.softmax(jnp.asarray(s), axis=1)
    return np.asarray(p @ v)


def test_matches_einsum(rng):
    lq, lk, dk, dv = 200, 700, 128, 256
    q = rng.randn(lq, dk).astype(np.float32)
    k = rng.randn(lk, dk).astype(np.float32)
    v = rng.randn(lk, dv).astype(np.float32)
    mask = (rng.rand(lk) > 0.3).astype(np.float32)
    out = np.asarray(masked_memory_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        q_tile=128, k_tile=256, interpret=True))
    ref = _reference(q, k, v, mask)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_all_but_one_masked(rng):
    lq, lk, dk, dv = 64, 256, 128, 128
    q = rng.randn(lq, dk).astype(np.float32)
    k = rng.randn(lk, dk).astype(np.float32)
    v = rng.randn(lk, dv).astype(np.float32)
    mask = np.zeros(lk, np.float32)
    mask[7] = 1.0
    out = np.asarray(masked_memory_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        q_tile=64, k_tile=128, interpret=True))
    # with one key attendable, output == that key's value for every query
    np.testing.assert_allclose(out, np.tile(v[7], (lq, 1)), rtol=1e-5,
                               atol=1e-5)
