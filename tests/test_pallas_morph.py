"""Pallas VMEM morphology/trimap kernel vs the XLA reference path.

Interpret mode on CPU (the conftest backend); on TPU the same kernel
compiles via Mosaic. Bit-exactness is required — the kernel replicates
`ops/morphology.py:_morph` shift-by-shift.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from video_unscreen_tpu.ops import morphology as morph
from video_unscreen_tpu.ops.pallas.morph import pallas_dilate, pallas_trimap
from video_unscreen_tpu.ops.trimap import generate_trimap


def _soft_mask(h, w, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    a = np.zeros((h, w), np.float32)
    a[((yy - h // 2) ** 2 / (h * 0.3) ** 2
       + (xx - w // 3) ** 2 / (w * 0.2) ** 2) < 1.0] = 255.0
    # soft ring + speckle exercise grayscale (not binary) morphology
    a *= rng.uniform(0.6, 1.0, (h, w)).astype(np.float32)
    a[rng.rand(h, w) < 0.002] = 200.0
    return a


@pytest.mark.parametrize("k,iters", [(3, 5), (4, 2), (5, 1)])
def test_pallas_dilate_erode_match(k, iters):
    a = jnp.asarray(_soft_mask(37, 150, seed=k))
    np.testing.assert_array_equal(
        np.asarray(pallas_dilate(a, k, iters, True)),
        np.asarray(morph.dilate(a, k, iters)))
    np.testing.assert_array_equal(
        np.asarray(pallas_dilate(a, k, iters, False)),
        np.asarray(morph.erode(a, k, iters)))


def test_pallas_trimap_matches_xla():
    a = jnp.asarray(_soft_mask(40, 130, seed=7))
    got = np.asarray(pallas_trimap(a, 3, 5))
    want = np.asarray(generate_trimap(a, 3, 5, use_pallas=False))
    np.testing.assert_array_equal(got, want)


def test_pallas_trimap_border_semantics():
    """A mask touching every border: erosion must see +inf outside the
    REAL grid, not the tile-alignment pad zeros."""
    a = np.full((16, 140), 255.0, np.float32)  # pads to (16, 256)
    got = np.asarray(pallas_trimap(jnp.asarray(a), 3, 5))
    want = np.asarray(generate_trimap(jnp.asarray(a), 3, 5,
                                      use_pallas=False))
    np.testing.assert_array_equal(got, want)


@pytest.mark.tpu
def test_mosaic_dilate_trimap_match_device():
    """Compiled (non-interpret) Mosaic lowering vs the XLA shifted-max
    chain ON DEVICE — the CPU suite only exercises the kernel
    interpreted (ADVICE round-4 low #4). Run: VU_TPU_TESTS=1 pytest
    tests/test_pallas_morph.py -m tpu. Verified on a real v5e chip
    2026-08-21 (round 5)."""
    from video_unscreen_tpu.ops.morphology import _morph, _se_offsets, \
        ellipse_kernel
    a = jnp.asarray(_soft_mask(544, 960, seed=3))
    want_d = np.asarray(_morph(a, _se_offsets(ellipse_kernel(3)), 5, True))
    np.testing.assert_array_equal(
        np.asarray(pallas_dilate(a, 3, 5, True)), want_d)
    want_e = np.asarray(_morph(a, _se_offsets(ellipse_kernel(3)), 5, False))
    np.testing.assert_array_equal(
        np.asarray(pallas_dilate(a, 3, 5, False)), want_e)
    got_t = np.asarray(pallas_trimap(a, 3, 5))
    want_t = np.asarray(generate_trimap(a, 3, 5, use_pallas=False))
    np.testing.assert_array_equal(got_t, want_t)
