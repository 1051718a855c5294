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


def test_yuv420_to_bgr_matches_cv2():
    """Device I420 decode == cv2.cvtColor(YUV2BGR_I420) within rounding
    (the host->HBM wire format of the fused pipelines)."""
    import jax.numpy as jnp
    from video_unscreen_tpu.ops.color import yuv420_to_bgr
    rng = np.random.RandomState(3)
    small = rng.rand(12, 16, 3)
    img = (cv2.resize(small.astype(np.float32), (128, 96)) * 255
           ).astype(np.uint8)
    i420 = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
    ref = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420).astype(np.float32)
    ours = np.asarray(yuv420_to_bgr(jnp.asarray(i420)))
    assert np.abs(ours - ref).mean() < 0.5
    assert np.abs(ours - ref).max() <= 2.0
    # and the roundtrip stays faithful to the original on smooth content
    assert np.abs(ours - img.astype(np.float32)).mean() < 8.0
