"""Tests: batched 1-D weighted GMM EM."""
import numpy as np
import jax.numpy as jnp

from video_unscreen_tpu.ops import gmm


def test_gmm_recovers_two_modes(rng):
    n = 2000
    x = np.concatenate([rng.randn(n) * 5 + 50, rng.randn(n) * 8 + 180])
    x = x[None, :].astype(np.float32)
    w = np.ones_like(x)
    active = np.zeros((1, 4), bool)
    active[0, :2] = True
    params = gmm.gmm_init(1, 4, jnp.asarray(active))
    params = gmm.gmm_cold_start(jnp.asarray(x), jnp.asarray(w), params,
                                jnp.asarray(active))
    params = gmm.gmm_fit_em(jnp.asarray(x), jnp.asarray(w), params,
                            jnp.asarray(active), iters=30)
    means = np.sort(np.asarray(params.means[0])[np.asarray(params.weights[0]) > 0.1])
    assert abs(means[0] - 50) < 3
    assert abs(means[1] - 180) < 3
    # padding components keep zero weight
    assert np.asarray(params.weights[0])[2:].max() == 0.0


def test_gmm_sample_weights_ignore_padding(rng):
    x = np.concatenate([rng.randn(500) + 100, np.zeros(500)])[None].astype(np.float32)
    w = np.concatenate([np.ones(500), np.zeros(500)])[None].astype(np.float32)
    active = np.ones((1, 2), bool)
    params = gmm.gmm_init(1, 2, jnp.asarray(active))
    params = gmm.gmm_cold_start(jnp.asarray(x), jnp.asarray(w), params,
                                jnp.asarray(active))
    params = gmm.gmm_fit_em(jnp.asarray(x), jnp.asarray(w), params,
                            jnp.asarray(active), iters=20)
    # both components should sit near 100, none dragged to the padded zeros
    assert np.all(np.abs(np.asarray(params.means[0]) - 100) < 5)


def test_gmm_pdf_integrates_to_one(rng):
    active = np.ones((1, 3), bool)
    params = gmm.GMMParams(
        weights=jnp.asarray([[0.2, 0.5, 0.3]]),
        means=jnp.asarray([[30.0, 128.0, 220.0]]),
        variances=jnp.asarray([[25.0, 100.0, 49.0]]),
    )
    xs = np.linspace(-200, 500, 14001, dtype=np.float32)[None]
    pdf = np.asarray(gmm.gmm_pdf(params, jnp.asarray(xs)))[0]
    integral = np.trapezoid(pdf, xs[0])
    assert abs(integral - 1.0) < 1e-3


def test_gmm_batched_models(rng):
    """Six models (3 channels x fg/bg) fit in one vmapped call."""
    m, n = 6, 1000
    centers = np.linspace(40, 220, m)
    x = np.stack([rng.randn(n) * 6 + c for c in centers]).astype(np.float32)
    w = np.ones_like(x)
    active = np.zeros((m, 10), bool)
    active[:3, :3] = True   # bg models: 3 comps
    active[3:, :10] = True  # fg models: 10 comps
    params = gmm.gmm_init(m, 10, jnp.asarray(active))
    params = gmm.gmm_cold_start(jnp.asarray(x), jnp.asarray(w), params,
                                jnp.asarray(active))
    params = gmm.gmm_fit_em(jnp.asarray(x), jnp.asarray(w), params,
                            jnp.asarray(active), iters=25)
    pw = np.asarray(params.weights)
    pm = np.asarray(params.means)
    for i, c in enumerate(centers):
        est = (pw[i] * pm[i]).sum() / pw[i].sum()
        assert abs(est - c) < 3.0
