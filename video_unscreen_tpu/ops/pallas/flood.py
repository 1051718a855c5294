"""Pallas run-max connected-component flood for TPU.

The segmented-scan CC flood (`ops/connected.py`) is the heaviest
always-on non-MXU stage of the fused pipelines (measured 3.2 ms/frame at
960x544 ds=2, plus ~4.4 ms of scatter-add stats — BASELINE.md budget).
XLA's `associative_scan` materializes every doubling step through HBM;
this kernel keeps the whole mask resident in VMEM and performs the same
directional segmented run-max sweeps entirely on the VPU:

  - labels start as each foreground pixel's flat index + 1,
  - one sweep = forward+backward Hillis-Steele segmented max-scans along
    lanes (rows) then sublanes (columns), each a log2(size) chain of
    `pltpu.roll` + select steps,
  - sweeps repeat in a `lax.while_loop` until the labels stabilize
    (O(spiral complexity) sweeps, typically < 6 for natural mattes),
  - a second flood propagates each component root's RANK (1..K, a
    VMEM-resident cumsum over root indicators), so the kernel emits
    dense compact component ids — per-object statistics then reduce
    with a small one-hot matmul on the MXU instead of a scatter into
    H*W bins (`ops/connected.py:invalid-object stats`).

Semantics match `ops/connected.py:connected_components` (4-connected,
background 0) with ids renumbered 1..K in root (bottom-right pixel)
raster order; equivalence is tested against the XLA path in
`tests/test_pallas_flood.py`. Reference semantics anchor:
`unscreen/utils/maskprocess.py:77-152` (cv2 connectedComponents +
per-contour loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_ids(h, w):
    return jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)


def _col_ids(h, w):
    return jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)


def _seg_scan_dir(v, r, axis: int, reverse: bool):
    """In-VMEM segmented max-scan along `axis` via Hillis-Steele doubling.

    `v` int32 values (identity 0), `r` int32 0/1 reset flags (identity 0).
    Inclusive scan of the combine used by `ops/connected.py:_seg_cummax`:
      combine((v1,r1),(v2,r2)) = (r2 ? v2 : max(v1,v2), r1|r2).
    """
    h, w = v.shape
    size = w if axis == 1 else h
    idx = _col_ids(h, w) if axis == 1 else _row_ids(h, w)
    k = 1
    while k < size:
        if not reverse:
            vs = pltpu.roll(v, k, axis)
            rs = pltpu.roll(r, k, axis)
            valid = idx >= k
        else:
            # circular roll by -k == roll by size - k (pltpu.roll only
            # accepts non-negative shifts)
            vs = pltpu.roll(v, size - k, axis)
            rs = pltpu.roll(r, size - k, axis)
            valid = idx < size - k
        vs = jnp.where(valid, vs, 0)
        rs = jnp.where(valid, rs, 0)
        v = jnp.where(r > 0, v, jnp.maximum(v, vs))
        r = jnp.bitwise_or(r, rs)
        k *= 2
    return v


def _flood_to_stable(lbl, seg_i, reset, max_sweeps: int):
    """Alternate 4-direction sweeps until labels stop changing."""

    def sweep(lbl):
        lbl = _seg_scan_dir(lbl, reset, axis=1, reverse=False)
        lbl = _seg_scan_dir(lbl, reset, axis=1, reverse=True)
        lbl = _seg_scan_dir(lbl, reset, axis=0, reverse=False)
        lbl = _seg_scan_dir(lbl, reset, axis=0, reverse=True)
        return lbl * seg_i

    def cond(state):
        lbl, prev, i = state
        return jnp.logical_and(i < max_sweeps, jnp.any(lbl != prev))

    def body(state):
        lbl, _, i = state
        return sweep(lbl), lbl, i + 1

    first = sweep(lbl)
    lbl, _, _ = jax.lax.while_loop(cond, body, (sweep(first), first,
                                                jnp.int32(1)))
    return lbl


def _flood_kernel(seg_ref, lbl_ref, cid_ref, max_sweeps: int):
    h, w = seg_ref.shape
    seg_i = (seg_ref[:] > 0).astype(jnp.int32)
    reset = 1 - seg_i

    ids = _row_ids(h, w) * w + _col_ids(h, w) + 1
    lbl = _flood_to_stable(ids * seg_i, seg_i, reset, max_sweeps)
    lbl_ref[:] = lbl

    # component roots carry their own id; rank = raster-order cumsum of
    # root indicators (rows scanned in VMEM, row offsets via a sublane
    # max-scan of the row-inclusive totals)
    root = jnp.where(lbl == ids, seg_i, 0)
    # raster cumsum of root indicators by doubling adds: rows first,
    # then row offsets down the sublane axis
    csum = root
    k = 1
    while k < w:
        shifted = pltpu.roll(csum, k, 1)
        csum = csum + jnp.where(_col_ids(h, w) >= k, shifted, 0)
        k *= 2
    row_tot = jnp.broadcast_to(csum[:, w - 1:w], (h, w))
    # exclusive prefix over rows: shift down one row, then inclusive
    # Hillis-Steele cumsum down the sublane axis
    offs = jnp.where(_row_ids(h, w) >= 1, pltpu.roll(row_tot, 1, 0), 0)
    k = 1
    while k < h:
        offs = offs + jnp.where(_row_ids(h, w) >= k,
                                pltpu.roll(offs, k, 0), 0)
        k *= 2
    rank = csum + offs  # inclusive raster cumsum of root at root pixels

    cid = _flood_to_stable(jnp.where(root > 0, rank, 0), seg_i, reset,
                           max_sweeps)
    cid_ref[:] = cid


def _pad_to(x, mult_h=8, mult_w=128):
    h, w = x.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)))
    return x, (h, w)


@functools.partial(jax.jit, static_argnums=(1, 2))
def connected_components_compact(mask: jax.Array, max_sweeps: int = 64,
                                 interpret: bool = False):
    """(labels, compact) int32 maps of `mask > 0`, Pallas TPU kernel.

    `labels` carries arbitrary unique positive ids (flat-index based,
    matching `ops/connected.py:connected_components` up to renumbering);
    `compact` renumbers components densely 1..K in root raster order —
    background 0 — so downstream per-object stats can one-hot matmul
    against a small static bin count.
    """
    if jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the kernel interpreted
    seg, (h, w) = _pad_to(mask.astype(jnp.float32))
    ph, pw = seg.shape
    lbl, cid = pl.pallas_call(
        functools.partial(_flood_kernel, max_sweeps=max_sweeps),
        out_shape=(jax.ShapeDtypeStruct((ph, pw), jnp.int32),
                   jax.ShapeDtypeStruct((ph, pw), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        # the two flood while_loops + unrolled doubling chains keep ~30
        # (H, W) int32 values live — 20.2M measured at 272x512, above the
        # 16M default scoped-vmem cap (a soft compiler default). Ask for
        # just enough headroom: an oversized cap becomes a phantom stack
        # reservation when the kernel is embedded in the fused-pipeline
        # scans (the failure mode documented for the attention kernel,
        # `pipeline/fused_bg.py` einsum fallback note).
        # (the vmapped/batched form inside the fused pipelines asks a few
        # hundred KB more than the standalone 20.2M, hence the slack)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=((ph * pw * 4 * 44 + (2 << 20))
                              // (1 << 20)) << 20),
        interpret=interpret,
    )(seg)
    return lbl[:h, :w], cid[:h, :w]
