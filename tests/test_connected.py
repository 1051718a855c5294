"""Tests: connected components / object removal / score map."""
import cv2
import numpy as np

from video_unscreen_tpu.ops import connected


def _labels_equiv(ours, ref):
    """Two labelings match iff they induce the same partition."""
    assert (ours > 0).sum() == (ref > 0).sum()
    pairs = set()
    for a, b in zip(ours[ours > 0].ravel(), ref[ours > 0].ravel()):
        pairs.add((int(a), int(b)))
    # bijection between label sets
    assert len({a for a, _ in pairs}) == len(pairs)
    assert len({b for _, b in pairs}) == len(pairs)


def test_connected_components_random(rng):
    mask = (rng.rand(48, 64) > 0.55).astype(np.uint8)
    ours = np.asarray(connected.connected_components(mask.astype(np.float32)))
    n, ref = cv2.connectedComponents(mask, connectivity=4)
    _labels_equiv(ours, ref)


def test_connected_components_spiral():
    mask = np.zeros((32, 32), np.uint8)
    mask[2, 2:30] = 1
    mask[2:30, 29] = 1
    mask[29, 4:30] = 1
    mask[6:30, 4] = 1
    mask[6, 4:26] = 1
    mask[10:20, 10] = 1  # second component
    ours = np.asarray(connected.connected_components(mask.astype(np.float32)))
    n, ref = cv2.connectedComponents(mask, connectivity=4)
    _labels_equiv(ours, ref)


def test_score_map_reference():
    """Replicates maskprocess.py:155-178 exactly."""
    h, w, center = 40, 60, (0.5, 0.5)
    ours = connected.score_map(h, w, center)
    sm = np.ones((h, w))
    y, x = int(h * center[0]), int(w * center[1])
    sm[:, x:w] = np.linspace(0, 1, w - x)[None, :] ** 2
    sm[:, 0:x] = np.linspace(1, 0, x)[None, :] ** 2
    sm[y:h] += np.linspace(0, 1, h - y)[:, None] ** 2
    sm[0:y] += np.linspace(1, 0, y)[:, None] ** 2
    sm = np.sqrt(sm)
    ref = (sm.max() - sm) / sm.max()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_remove_invalid_objects():
    h, w = 96, 128
    alpha = np.zeros((h, w), np.float32)
    # central large blob: kept
    alpha[30:70, 40:90] = 255.0
    # small noise blob (< 100 px): dropped
    alpha[5:11, 5:11] = 255.0
    # big corner blob not in segmask and off-center: dropped
    alpha[76:95, 0:22] = 255.0
    segmask = np.zeros((h, w), np.float32)
    segmask[30:70, 40:90] = 255.0
    score = connected.score_map(h, w, (0.5, 0.5))
    out = np.asarray(connected.remove_invalid_objects(
        alpha, segmask, score, saliency_thr=0.005, consensus_thr=0.5))
    assert (out[30:70, 40:90] == 255).all()
    assert (out[5:11, 5:11] == 0).all()
    assert (out[76:95, 0:22] == 0).all()


def test_remove_invalid_objects_saliency_override():
    """A very salient object survives without segmask consensus."""
    h, w = 96, 128
    alpha = np.zeros((h, w), np.float32)
    alpha[20:80, 30:100] = 255.0  # huge central blob
    segmask = np.zeros((h, w), np.float32)  # no consensus at all
    score = connected.score_map(h, w, (0.5, 0.5))
    out = np.asarray(connected.remove_invalid_objects(
        alpha, segmask, score, saliency_thr=0.005, consensus_thr=0.5))
    assert (out[20:80, 30:100] == 255).all()
