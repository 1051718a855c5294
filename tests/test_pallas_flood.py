"""Pallas CC flood kernel vs the XLA segmented-scan path (interpret mode
on CPU; the compiled kernel is exercised on TPU by the fused pipelines).

Covers: identical partitions, dense compact ids, and decision-level
equivalence of `remove_invalid_objects_compact` with the scatter-stats
`remove_invalid_objects` — including speckle-heavy masks where dense
ranks are earned by the isolated-pixel pre-drop.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from video_unscreen_tpu.ops.connected import (
    connected_components, remove_invalid_objects,
    remove_invalid_objects_compact, score_map)
from video_unscreen_tpu.ops.pallas.flood import connected_components_compact


def canon(lbl):
    """Renumber labels in first-appearance order for partition compare."""
    out = np.zeros_like(lbl)
    mapping = {}
    for v in lbl.flatten():
        if v and v not in mapping:
            mapping[v] = len(mapping) + 1
    for k, v in mapping.items():
        out[lbl == k] = v
    return out


@pytest.mark.parametrize("seed,p", [(0, 0.3), (1, 0.45), (2, 0.05)])
def test_flood_partition_matches_xla(seed, p):
    rng = np.random.RandomState(seed)
    h, w = 24, 136  # non-128-multiple width exercises the pad path
    mask = (rng.rand(h, w) < p).astype(np.float32) * 255.0
    lbl_ref = np.asarray(connected_components(jnp.asarray(mask)))
    lbl, cid = connected_components_compact(jnp.asarray(mask))
    lbl, cid = np.asarray(lbl), np.asarray(cid)
    assert np.array_equal(canon(lbl_ref), canon(lbl))
    # compact ids: dense 1..K, exactly one id per component
    k = cid.max()
    if k:
        assert set(np.unique(cid[mask > 0])) == set(range(1, k + 1))
    for comp in np.unique(lbl[lbl > 0]):
        assert len(np.unique(cid[lbl == comp])) == 1


def test_remove_invalid_compact_matches_scatter():
    rng = np.random.RandomState(3)
    h, w = 48, 128
    yy, xx = np.mgrid[0:h, 0:w]
    for speckle in (0.0, 0.01, 0.05):
        alpha = np.zeros((h, w), np.float32)
        alpha[((yy - h // 2) ** 2 / 300 + (xx - w // 3) ** 2 / 200)
              < 1.0] = 255.0
        alpha[rng.rand(h, w) < speckle] = 255.0
        seg = alpha * (rng.rand(h, w) > 0.1)
        score = jnp.asarray(score_map(h, w))
        a, s = jnp.asarray(alpha), jnp.asarray(seg)
        ref = np.asarray(remove_invalid_objects(a, s, score, 0.005, 0.5,
                                                9))
        new = np.asarray(remove_invalid_objects_compact(
            a, s, score, 0.005, 0.5, 9))
        assert np.array_equal(ref, new), speckle


def test_empty_and_full_masks():
    h, w = 16, 128
    for mask in (np.zeros((h, w), np.float32),
                 np.full((h, w), 255.0, np.float32)):
        lbl, cid = connected_components_compact(jnp.asarray(mask))
        n = int(np.asarray(cid).max())
        assert n == (0 if mask.max() == 0 else 1)
