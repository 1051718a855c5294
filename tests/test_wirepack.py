"""Wire-packing round trip — the packed d2h alpha plane must be
bit-exact against the raw plane (VERDICT r4 item 5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_unscreen_tpu.ops.wirepack import (default_capacity, pack_plane,
                                             packed_size, unpack_plane,
                                             unpack_planes)


def _mostly_binary_plane(rng, h, w, band_frac=0.03):
    a = np.where(rng.rand(h, w) < 0.4, 255, 0).astype(np.uint8)
    band = rng.rand(h, w) < band_frac
    a[band] = rng.randint(1, 255, band.sum()).astype(np.uint8)
    return a


def test_roundtrip_bit_exact():
    rng = np.random.RandomState(0)
    a = _mostly_binary_plane(rng, 64, 96)
    buf = np.asarray(jax.jit(pack_plane)(jnp.asarray(a)))
    assert buf.size == packed_size(64, 96)
    out = unpack_plane(buf, 64, 96)
    np.testing.assert_array_equal(out, a)


def test_roundtrip_float_input_and_extremes():
    rng = np.random.RandomState(1)
    for a in (np.zeros((32, 64), np.uint8),
              np.full((32, 64), 255, np.uint8),
              rng.randint(0, 256, (32, 64)).astype(np.uint8)):
        # a fully-random plane has ~99% band pixels -> needs capacity
        cap = a.size
        buf = np.asarray(pack_plane(jnp.asarray(a, jnp.float32), cap))
        out = unpack_plane(buf, 32, 64, cap)
        np.testing.assert_array_equal(out, a)


def test_overflow_returns_none_and_fallback():
    rng = np.random.RandomState(2)
    a = rng.randint(1, 255, (16, 16)).astype(np.uint8)  # all band
    cap = 8  # force overflow
    buf = np.asarray(pack_plane(jnp.asarray(a), cap))
    assert unpack_plane(buf, 16, 16, cap) is None
    out = unpack_planes(buf[None], 16, 16, cap, fallback=lambda i: a)
    np.testing.assert_array_equal(out[0], a)
    with pytest.raises(ValueError):
        unpack_planes(buf[None], 16, 16, cap)


def test_batch_unpack_and_size_math():
    rng = np.random.RandomState(3)
    planes = np.stack([_mostly_binary_plane(rng, 32, 32)
                       for _ in range(3)])
    bufs = np.asarray(jax.vmap(pack_plane)(jnp.asarray(planes)))
    out = unpack_planes(bufs, 32, 32)
    np.testing.assert_array_equal(out, planes)
    assert default_capacity(32, 32) == 64
    wire = packed_size(32, 32)
    assert wire == 32 * 32 // 4 + 64 + 4
