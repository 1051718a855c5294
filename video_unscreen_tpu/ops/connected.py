"""Connected components + invalid-object removal without dynamic shapes.

The one genuinely TPU-awkward op in the reference
(`unscreen/utils/maskprocess.py:77-152` uses cv2.findContours + per-contour
python loops). TPU-native design:

- **Labeling** is a segmented-scan label flood: initialize every foreground
  pixel with its own id, then alternately propagate the running maximum along
  rows and columns *within mask runs* (a segmented cummax via
  `lax.associative_scan`, forward+backward). Each sweep propagates labels
  across an entire run, so convergence takes O(spiral complexity) sweeps —
  typically < 10 for natural masks — instead of O(image diameter) for naive
  3x3 flooding. A `while_loop` exits early once labels are stable.

- **Per-object statistics** (area, location-weighted saliency, consensus with
  the segmentation mask) are dense segment-sums keyed by label
  (`zeros(n).at[label].add(...)`), then gathered back per pixel. No contour
  extraction, no host round-trip.

Known divergence from the reference: cv2.drawContours(FILLED) fills holes
inside an object when scoring it and cv2.contourArea measures polygon area;
we use exact pixel membership for both. Thresholds are ratios, so behavior
matches on real mattes (validated in tests against cv2 end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _seg_cummax(vals: jax.Array, seg: jax.Array, axis: int,
                reverse: bool) -> jax.Array:
    """Segmented running max of `vals` along `axis`; segments are runs of
    True in `seg`, and the scan resets at False cells."""
    reset = ~seg

    def combine(a, b):
        v1, r1 = a
        v2, r2 = b
        v = jnp.where(r2, v2, jnp.maximum(v1, v2))
        return v, r1 | r2

    v, _ = jax.lax.associative_scan(combine, (vals, reset), axis=axis,
                                    reverse=reverse)
    return jnp.where(seg, v, 0)


def _flood_sweep(lbl: jax.Array, seg: jax.Array) -> jax.Array:
    lbl = _seg_cummax(lbl, seg, axis=1, reverse=False)
    lbl = _seg_cummax(lbl, seg, axis=1, reverse=True)
    lbl = _seg_cummax(lbl, seg, axis=0, reverse=False)
    lbl = _seg_cummax(lbl, seg, axis=0, reverse=True)
    return lbl


@functools.partial(jax.jit, static_argnums=(1,))
def connected_components(mask: jax.Array, max_sweeps: int = 64) -> jax.Array:
    """4-connected component labels of `mask > 0`.

    Returns (H, W) int32 labels; 0 is background and each component carries
    an arbitrary unique positive id (the max flat pixel index + 1 inside it).
    """
    seg = mask > 0
    h, w = seg.shape
    ids = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    lbl = jnp.where(seg, ids, 0)

    def cond(state):
        lbl, prev, i = state
        return (i < max_sweeps) & jnp.any(lbl != prev)

    def body(state):
        lbl, _, i = state
        return _flood_sweep(lbl, seg), lbl, i + 1

    lbl = _flood_sweep(lbl, seg)
    lbl, _, _ = jax.lax.while_loop(cond, body, (_flood_sweep(lbl, seg), lbl, 1))
    return lbl


def score_map(h: int, w: int, center=(0.5, 0.5)) -> np.ndarray:
    """Host-side location score map (1 at `center`, falling to 0 at borders).

    Replica of `unscreen/utils/maskprocess.py:155-178`: squared linear ramps
    away from the center row/column, sqrt-ed, then inverted/normalized.
    Built once per clip geometry on the host and constant-folded into the
    compiled program.
    """
    sm = np.ones((h, w), np.float64)
    y, x = int(h * center[0]), int(w * center[1])
    if w - x > 0:
        sm[:, x:w] = np.linspace(0, 1, w - x)[None, :] ** 2
    if x > 0:
        sm[:, 0:x] = np.linspace(1, 0, x)[None, :] ** 2
    if h - y > 0:
        sm[y:h] += np.linspace(0, 1, h - y)[:, None] ** 2
    if y > 0:
        sm[0:y] += np.linspace(1, 0, y)[:, None] ** 2
    sm = np.sqrt(sm)
    sm = (sm.max() - sm) / sm.max()
    return sm.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def remove_invalid_objects(alpha: jax.Array, segmask: jax.Array,
                           score: jax.Array,
                           saliency_thr: float = 0.005,
                           consensus_thr: float = 0.5,
                           min_area: int = 100) -> jax.Array:
    """Zero out foreground blobs that are small, off-center, or not agreed
    by the segmentation mask.

    Per component: saliency = sum(score_map) / (h*w); consensus = mean of
    segmask/255. Keep iff (saliency > thr AND consensus > consensus_thr) OR
    saliency > 10*thr; blobs under `min_area` px are dropped outright.
    Equivalent of `unscreen/utils/maskprocess.py:77-152`.
    """
    h, w = alpha.shape
    lbl = connected_components(alpha)
    flat = lbl.reshape(-1)
    n = h * w + 1
    ones = (flat > 0).astype(jnp.float32)
    area = jnp.zeros(n, jnp.float32).at[flat].add(ones)
    sal = jnp.zeros(n, jnp.float32).at[flat].add(score.reshape(-1) * ones)
    cons = jnp.zeros(n, jnp.float32).at[flat].add(
        (segmask.reshape(-1) / 255.0) * ones)
    saliency = sal / float(h * w)
    consensus = cons / jnp.maximum(area, 1.0)
    valid = (area >= min_area) & (
        ((saliency > saliency_thr) & (consensus > consensus_thr))
        | (saliency > saliency_thr * 10.0))
    valid = valid.at[0].set(False)
    keep = valid[flat].reshape(h, w)
    return jnp.where(keep, alpha, 0.0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def remove_invalid_objects_compact(alpha: jax.Array, segmask: jax.Array,
                                   score: jax.Array,
                                   saliency_thr: float = 0.005,
                                   consensus_thr: float = 0.5,
                                   min_area: int = 100,
                                   max_components: int = 1024) -> jax.Array:
    """remove_invalid_objects on the Pallas flood kernel (TPU fast path).

    `ops/pallas/flood.py:connected_components_compact` labels the mask in
    VMEM and emits DENSE component ids 1..K, so the per-object sums
    (area, location saliency, segmask consensus) become one one-hot
    matmul into `max_components` static bins on the MXU — replacing the
    H*W-bin scatter-adds of the XLA path (measured 3.2 ms flood +
    ~4.4 ms stats -> ~2 ms total at 272x480). Components ranked beyond
    `max_components - 1` (pathological speckle only) are dropped like
    sub-min_area blobs. Decision semantics match `remove_invalid_objects`
    (reference `unscreen/utils/maskprocess.py:77-152`).
    """
    from .morphology import _shift2d
    from .pallas.flood import connected_components_compact

    h, w = alpha.shape
    alpha_in = alpha
    if min_area > 1:
        # pre-drop isolated pixels (components of area 1 — always below
        # min_area, so the reference drops them too): speckle is the
        # dominant component population in noisy GMM masks, and culling
        # it here keeps dense ranks well under max_components
        fg_m = (alpha > 0).astype(jnp.float32)
        nbr = jnp.zeros_like(fg_m)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    nbr = jnp.maximum(nbr, _shift2d(fg_m, dy, dx, 0.0))
        alpha_in = jnp.where(nbr > 0, alpha, 0.0)
    _, cid = connected_components_compact(alpha_in)
    raw_max = cid.max()
    cid = jnp.minimum(cid, max_components - 1)
    flat = cid.reshape(-1)
    fg = (flat > 0).astype(jnp.float32)
    feats = jnp.stack(
        [fg, score.reshape(-1) * fg, (segmask.reshape(-1) / 255.0) * fg],
        axis=-1)
    oh = jax.nn.one_hot(flat, max_components, dtype=jnp.float32)
    sums = jnp.einsum("nk,nf->kf", oh, feats,
                      preferred_element_type=jnp.float32)
    area = sums[:, 0]
    saliency = sums[:, 1] / float(h * w)
    consensus = sums[:, 2] / jnp.maximum(area, 1.0)
    valid = (area >= min_area) & (
        ((saliency > saliency_thr) & (consensus > consensus_thr))
        | (saliency > saliency_thr * 10.0))
    valid = valid.at[0].set(False)
    # the clamp bin is only trustworthy when nothing overflowed into it
    valid = valid.at[max_components - 1].set(
        valid[max_components - 1] & (raw_max < max_components))
    keep = jnp.take(valid, flat).reshape(h, w)
    return jnp.where(keep, alpha, 0.0)


def _invalid_objects_impl(use_pallas: bool):
    return (remove_invalid_objects_compact if use_pallas
            else remove_invalid_objects)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def remove_invalid_objects_ds(alpha: jax.Array, segmask: jax.Array,
                              score: jax.Array,
                              saliency_thr: float = 0.005,
                              consensus_thr: float = 0.5,
                              min_area: int = 100,
                              downscale: int = 2) -> jax.Array:
    """remove_invalid_objects with the labeling + stats at 1/downscale res.

    Saliency/consensus are resolution-invariant ratios; `min_area` scales
    by downscale^2. The keep-mask is upsampled (nearest) and applied to
    the full-res alpha — a ~downscale^2 cut of the scatter/flood cost in
    the fused pipelines. On TPU the labeling + stats run through the
    Pallas flood kernel (`remove_invalid_objects_compact`); other
    backends keep the XLA segmented-scan + scatter path (Pallas
    interpret mode is orders of magnitude slower than XLA on CPU).
    """
    impl = _invalid_objects_impl(jax.default_backend() == "tpu")
    if downscale == 1:
        return impl(alpha, segmask, score, saliency_thr,
                    consensus_thr, min_area)
    from .geometry import resize
    h, w = alpha.shape
    lh, lw = h // downscale, w // downscale
    alpha_lr = resize(alpha, (lh, lw), method="nearest")
    seg_lr = resize(segmask, (lh, lw), method="nearest")
    score_lr = resize(score, (lh, lw), method="nearest")
    kept_lr = impl(
        alpha_lr, seg_lr, score_lr, saliency_thr, consensus_thr,
        max(min_area // (downscale * downscale), 1))
    keep = resize((kept_lr > 0).astype(jnp.float32), (h, w),
                  method="nearest") > 0
    return jnp.where(keep, alpha, 0.0)
