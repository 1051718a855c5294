"""Tests: trimap generation vs reference semantics."""
import cv2
import numpy as np

from video_unscreen_tpu.ops import trimap as tri


def _ref_trimap(mask, ksize=3, iters=5):
    """Reference core (trimap/agent.py:54-58) at working resolution."""
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    trimap = np.full(mask.shape, 128, np.uint8)
    dil = cv2.dilate(mask, kernel, iterations=iters)
    ero = cv2.erode(mask, kernel, iterations=iters)
    trimap[ero > 127] = 255
    trimap[dil < 128] = 0
    return trimap


def test_generate_trimap(rng):
    mask = np.zeros((64, 80), np.uint8)
    mask[16:48, 20:60] = 255
    ours = np.asarray(tri.generate_trimap(mask.astype(np.float32), 3, 5))
    ref = _ref_trimap(mask).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)
    assert set(np.unique(ours)) <= {0.0, 128.0, 255.0}


def test_generate_trimap_withbg_consistent():
    """Fuzzy chroma pixels inside the mask get marked unknown."""
    h, w = 64, 80
    img = np.zeros((h, w, 3), np.float32)
    img[...] = (200, 50, 180)  # magenta fg everywhere
    img[16:22, 20:60] = (40, 200, 60)  # a green (bg-colored) strip inside fg
    mask = np.zeros((h, w), np.float32)
    mask[16:48, 20:60] = 255.0
    bg = np.array([40, 200, 60], np.float32)
    out = np.asarray(tri.generate_trimap_withbg(mask, img, bg, 3, 5,
                                                (10, 100, 180)))
    # the green strip is < 10% of mask? strip = 6*40=240 px, mask=32*40=1280
    # 240/1280 > 0.1 -> falls back to mask-only trimap
    ref = np.asarray(tri.generate_trimap(mask, 3, 5))
    np.testing.assert_array_equal(out, ref)


def test_generate_trimap_withbg_small_fuzzy():
    h, w = 64, 80
    img = np.full((h, w, 3), (200, 50, 180), np.float32)
    img[30:33, 38:42] = (40, 200, 60)  # tiny green patch inside fg
    mask = np.zeros((h, w), np.float32)
    mask[16:48, 20:60] = 255.0
    bg = np.array([40, 200, 60], np.float32)
    out = np.asarray(tri.generate_trimap_withbg(mask, img, bg, 3, 5,
                                                (10, 100, 180)))
    # fuzzy pixels are forced to unknown
    assert (out[30:33, 38:42] == 128).all()


def test_generate_trimap_withbg_empty_mask():
    img = np.zeros((32, 32, 3), np.float32)
    mask = np.zeros((32, 32), np.float32)
    bg = np.array([40, 200, 60], np.float32)
    out = np.asarray(tri.generate_trimap_withbg(mask, img, bg))
    np.testing.assert_array_equal(out, mask)
