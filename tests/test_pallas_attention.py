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


def test_custom_vjp_matches_autodiff(rng):
    """Flash backward (custom VJP, interpret mode) vs autodiff through the
    dense einsum reference."""
    lq, lk, dk, dv = 150, 300, 128, 128
    q = jnp.asarray(rng.randn(lq, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(lk, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(lk, dv).astype(np.float32))
    mask = jnp.asarray((rng.rand(lk) > 0.3).astype(np.float32))
    g = jnp.asarray(rng.randn(lq, dv).astype(np.float32))

    def flash_loss(q_, k_, v_):
        out = masked_memory_attention(q_, k_, v_, mask, q_tile=128,
                                      k_tile=128, interpret=True)
        return jnp.vdot(out, g)

    def dense_loss(q_, k_, v_):
        s = (q_ @ k_.T) / jnp.sqrt(jnp.float32(dk))
        s = jnp.where(mask[None, :] > 0, s, -1e30)
        p = jax.nn.softmax(s, axis=1)
        return jnp.vdot(p @ v_, g)

    gq, gk, gv = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=2e-3, atol=2e-3)
    # masked keys receive exactly zero gradient
    dead = np.asarray(mask) == 0
    assert np.abs(np.asarray(gk)[dead]).max() == 0.0
    assert np.abs(np.asarray(gv)[dead]).max() == 0.0


def test_custom_vjp_under_vmap(rng):
    """memory_read vmaps the kernel over the batch axis; the VJP must
    survive vmap + grad composition."""
    b, lq, lk, d = 2, 130, 140, 128
    q = jnp.asarray(rng.randn(b, lq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, lk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, d).astype(np.float32))
    mask = jnp.ones((b, lk), jnp.float32)

    def loss(q_, k_, v_):
        fn = lambda a, b_, c, m: masked_memory_attention(  # noqa: E731
            a, b_, c, m, q_tile=128, k_tile=128, interpret=True)
        return jax.vmap(fn)(q_, k_, v_, mask).sum()

    def dense(q_, k_, v_):
        s = jnp.einsum("bqc,bkc->bqk", q_, k_) / jnp.sqrt(jnp.float32(d))
        p = jax.nn.softmax(s, axis=2)
        return jnp.einsum("bqk,bkv->bqv", p, v_).sum()

    gq = jax.grad(loss)(q, k, v)
    rq = jax.grad(dense)(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                               rtol=2e-3, atol=2e-3)


def test_zero_valid_keys_returns_zero(rng):
    """All keys masked -> zero output and zero gradient to every input
    (the kernel used to silently return mean(V) — ADVICE round-2)."""
    lq, lk, dk, dv = 64, 128, 128, 128
    q = jnp.asarray(rng.randn(lq, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(lk, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(lk, dv).astype(np.float32))
    mask = jnp.zeros(lk, jnp.float32)

    out = np.asarray(masked_memory_attention(
        q, k, v, mask, q_tile=64, k_tile=128, interpret=True))
    np.testing.assert_allclose(out, 0.0)

    def loss(q_, k_, v_):
        return masked_memory_attention(q_, k_, v_, mask, q_tile=64,
                                       k_tile=128, interpret=True).sum()

    dq, dk_, dv_ = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), 0.0)
    np.testing.assert_allclose(np.asarray(dk_), 0.0)
    np.testing.assert_allclose(np.asarray(dv_), 0.0)
