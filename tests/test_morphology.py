"""Golden tests: morphology vs cv2."""
import cv2
import numpy as np
import pytest

from video_unscreen_tpu.ops import morphology


@pytest.mark.parametrize("ksize", [3, 5, 7])
def test_ellipse_kernel(ksize):
    ours = morphology.ellipse_kernel(ksize)
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ksize,iters", [(3, 1), (3, 5), (5, 3)])
def test_dilate(rng, ksize, iters):
    mask = (rng.rand(40, 56) > 0.8).astype(np.uint8) * 255
    ours = np.asarray(morphology.dilate(mask.astype(np.float32), ksize, iters))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    ref = cv2.dilate(mask, kernel, iterations=iters).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ksize,iters", [(3, 1), (3, 5), (5, 3)])
def test_erode(rng, ksize, iters):
    mask = (rng.rand(40, 56) > 0.3).astype(np.uint8) * 255
    ours = np.asarray(morphology.erode(mask.astype(np.float32), ksize, iters))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    ref = cv2.erode(mask, kernel, iterations=iters).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


def test_grayscale_dilate(rng):
    img = rng.randint(0, 256, (30, 30)).astype(np.uint8)
    ours = np.asarray(morphology.dilate(img.astype(np.float32), 3, 2))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    ref = cv2.dilate(img, kernel, iterations=2).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


def test_box_filter(rng):
    img = rng.randint(0, 256, (32, 40)).astype(np.float32)
    ours = np.asarray(morphology.box_filter(img, 5))
    ref = cv2.boxFilter(img, -1, (5, 5))
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_box_filter_3ch(rng):
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.float32)
    ours = np.asarray(morphology.box_filter(img, 3))
    ref = cv2.boxFilter(img, -1, (3, 3))
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_outer_boundary(rng):
    mask = np.zeros((40, 40), np.uint8)
    mask[10:30, 12:28] = 255
    ours = np.asarray(morphology.get_outer_boundary(
        mask.astype(np.float32), 7, 10))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))
    dil = cv2.dilate(mask, kernel, iterations=10)
    ref = np.clip(dil.astype(np.int32) - mask, 0, 255).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)
