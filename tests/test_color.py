"""Golden tests: color conversions vs OpenCV 8-bit behavior."""
import cv2
import numpy as np
import pytest

from video_unscreen_tpu.ops import color


def _rand_img(rng, h=33, w=47):
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_bgr2gray(rng):
    img = _rand_img(rng)
    ours = np.asarray(color.bgr2gray(img.astype(np.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_bgr2hsv(rng):
    img = _rand_img(rng)
    ours = np.asarray(color.bgr2hsv(img.astype(np.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    # cv2 rounds to uint8 (H wraps at 180); compare circular H, linear S/V.
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert dh.max() <= 1.0
    assert np.abs(ours[..., 1:] - ref[..., 1:]).max() <= 1.0


def test_hsv_roundtrip(rng):
    img = _rand_img(rng).astype(np.float32)
    back = np.asarray(color.hsv2bgr(color.bgr2hsv(img)))
    assert np.abs(back - img).max() <= 1e-2


def test_hsv2bgr_matches_cv2(rng):
    hsv = np.stack([rng.randint(0, 180, (17, 19)),
                    rng.randint(0, 256, (17, 19)),
                    rng.randint(0, 256, (17, 19))], -1).astype(np.uint8)
    ours = np.asarray(color.hsv2bgr(hsv.astype(np.float32)))
    ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_bgr2lab(rng):
    img = _rand_img(rng)
    ours = np.asarray(color.bgr2lab(img.astype(np.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2Lab).astype(np.float32)
    assert np.abs(ours - ref).max() <= 2.0, (
        f"max err {np.abs(ours - ref).max()}")
