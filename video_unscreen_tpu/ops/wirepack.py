"""Device->host wire packing for alpha-like planes.

The fused pipelines' d2h payload is dominated by full-res uint8 alpha
planes that are ~97% exactly {0, 255} (the trimap hard-reset forces
everything outside the unknown band to 0/255 —
`unscreen/vmatting/agent.py:128-131`). On the bandwidth-limited axon
tunnel (~8-40 MB/s) every byte is wall-clock, so the plane crosses the
link packed (VERDICT r4 item 5):

    [hi bits n/8] [band bits n/8] [band values K] [count 4B LE]

- `hi` bit j of byte i: pixel 8i+j == 255 (row-major flat order).
- `band` bit: 0 < pixel < 255 (the unknown-band survivors).
- `band values`: the band pixels' uint8 values in row-major order,
  capacity K; `count` is the TRUE number of band pixels. count > K
  means the fixed budget overflowed — the packed buffer is then NOT
  reconstructable and the caller must fall back to fetching the full
  plane (the fused drivers keep it device-resident for exactly this).

0.25 B/px + K vs 1 B/px raw: ~3.3x less d2h at the default
K = n/16 (a 6.25%-of-pixels band budget; measured bands are ~3%).
Reconstruction is bit-exact: non-band pixels are exactly 0 or 255 by
definition, band pixels ship verbatim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def packed_size(h: int, w: int, capacity: int | None = None) -> int:
    n = h * w
    assert n % 8 == 0, "plane size must be a multiple of 8"
    if capacity is None:
        capacity = default_capacity(h, w)
    return n // 4 + capacity + 4


def default_capacity(h: int, w: int) -> int:
    return (h * w) // 16


def _bits_to_bytes(bits: jax.Array) -> jax.Array:
    """(n,) bool -> (n/8,) uint8, bit j of byte i = element 8i+j
    (numpy `bitorder='little'` convention)."""
    bb = bits.reshape(-1, 8).astype(jnp.int32)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))
    return (bb * weights).sum(axis=1).astype(jnp.uint8)


def pack_plane(plane: jax.Array, capacity: int | None = None) -> jax.Array:
    """(h, w) float/uint8 0..255 -> (packed_size,) uint8. Jittable."""
    h, w = plane.shape
    if capacity is None:
        capacity = default_capacity(h, w)
    a = jnp.clip(plane, 0, 255).astype(jnp.uint8).reshape(-1)
    hi = a == 255
    band = (a > 0) & (a < 255)
    count = band.sum(dtype=jnp.int32)
    pos = jnp.cumsum(band, dtype=jnp.int32) - 1
    idx = jnp.where(band, pos, capacity)   # capacity == OOB -> dropped
    vals = jnp.zeros((capacity,), jnp.uint8).at[idx].set(
        a, mode="drop", unique_indices=True)
    count_le = jnp.stack(
        [(count >> s) & 0xFF for s in (0, 8, 16, 24)]).astype(jnp.uint8)
    return jnp.concatenate(
        [_bits_to_bytes(hi), _bits_to_bytes(band), vals, count_le])


def unpack_plane(buf: np.ndarray, h: int, w: int,
                 capacity: int | None = None) -> np.ndarray | None:
    """Host-side inverse of `pack_plane`. Returns the (h, w) uint8 plane,
    or None when the band budget overflowed (count > capacity) — the
    caller must then fetch the full plane from the device."""
    n = h * w
    if capacity is None:
        capacity = default_capacity(h, w)
    buf = np.asarray(buf, np.uint8)
    assert buf.size == packed_size(h, w, capacity), (
        f"packed buffer size {buf.size} != {packed_size(h, w, capacity)}")
    count = int(buf[-4:].view(np.uint32)[0])
    if count > capacity:
        return None
    hi = np.unpackbits(buf[:n // 8], bitorder="little")
    out = np.where(hi.astype(bool), 255, 0).astype(np.uint8)
    band_idx = np.flatnonzero(
        np.unpackbits(buf[n // 8:n // 4], bitorder="little"))
    out[band_idx] = buf[n // 4:n // 4 + capacity][:band_idx.size]
    return out.reshape(h, w)


def unpack_planes(bufs: np.ndarray, h: int, w: int,
                  capacity: int | None = None,
                  fallback=None) -> np.ndarray:
    """Unpack a (N, packed_size) batch to (N, h, w) uint8. `fallback(i)`
    supplies frame i's full plane on band-budget overflow (rare: >6.25%
    of pixels in the unknown band)."""
    out = np.empty((bufs.shape[0], h, w), np.uint8)
    for i in range(bufs.shape[0]):
        plane = unpack_plane(bufs[i], h, w, capacity)
        if plane is None:
            if fallback is None:
                raise ValueError(
                    f"packed plane {i} overflowed its band budget and no "
                    f"fallback was provided")
            plane = np.asarray(fallback(i), np.uint8)
        out[i] = plane
    return out
