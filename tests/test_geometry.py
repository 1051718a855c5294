"""Golden tests: geometry ops vs the reference cv2 behavior."""
import cv2
import numpy as np

from video_unscreen_tpu.ops import geometry


def _ref_pad_resize(img, target_size):
    """Reference pad_resize re-derived with cv2 (imgprocess.py:67-97)."""
    target_h, target_w = target_size
    h, w = img.shape[:2]
    if float(h) / w > float(target_h) / target_w:
        new_h, new_w = target_h, int(float(target_h) * w / h)
        pad_h, pad_w = 0, target_w - new_w
    else:
        new_w, new_h = target_w, int(float(target_w) * h / w)
        pad_h, pad_w = target_h - new_h, 0
    out = cv2.resize(img, (new_w, new_h))
    return cv2.copyMakeBorder(out, 0, pad_h, 0, pad_w, cv2.BORDER_REFLECT)


def test_get_target_size():
    assert geometry.get_target_size(1080, 1920, 960) == (540, 960)
    assert geometry.get_target_size(1080, 1920, 960, 32) == (544, 960)
    assert geometry.get_target_size(1920, 1080, 962) == (962, 541)
    assert geometry.get_target_size(1920, 1080, 962, 2) == (962, 542)
    assert geometry.get_target_size(720, 720, 960, 16) == (960, 960)


def test_pad_resize_matches_cv2(rng):
    img = rng.randint(0, 256, (108, 192, 3)).astype(np.uint8)
    target = (96, 128)
    ours = np.asarray(geometry.pad_resize(img.astype(np.float32), target))
    ref = _ref_pad_resize(img, target).astype(np.float32)
    assert ours.shape == ref.shape
    # interiors match to interpolation tolerance
    assert np.abs(ours - ref).mean() < 2.0


def test_pad_resize_roundtrip():
    # smooth image: the roundtrip is lossy only in high frequencies
    yy, xx = np.mgrid[0:90, 0:160].astype(np.float32)
    img = 127 + 100 * np.sin(yy / 20.0) * np.cos(xx / 30.0)
    padded = geometry.pad_resize(img, (128, 128))
    assert padded.shape == (128, 128)
    back = np.asarray(geometry.inv_pad_resize(padded, (90, 160)))
    assert back.shape == (90, 160)
    assert np.abs(back - img).mean() < 2.0


def test_imnormalize(rng):
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.float32)
    out = np.asarray(geometry.imnormalize(img))
    ref = (img[..., ::-1] / 255.0 - geometry.IMAGENET_MEAN) / geometry.IMAGENET_STD
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_affine_warp_identity(rng):
    img = rng.randint(0, 256, (32, 40)).astype(np.float32)
    m = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    out = np.asarray(geometry.affine_warp(img, m, (32, 40)))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_affine_warp_matches_cv2(rng):
    img = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    m = np.array([[0.8, 0.1, 3.0], [-0.05, 0.9, 2.0]], np.float32)
    ours = np.asarray(geometry.affine_warp(img.astype(np.float32), m, (48, 64)))
    ref = cv2.warpAffine(img, m, (64, 48)).astype(np.float32)
    # borders differ (cv2 rounds + constant border); compare interior
    diff = np.abs(ours - ref)[4:-4, 4:-4]
    assert np.median(diff) <= 1.0
    assert diff.mean() < 3.0


def test_affine_warp_axis_aligned_matches_general(rng):
    """The MXU-matmul warp (SCHP fast path) vs map_coordinates."""
    import jax.numpy as jnp
    img = rng.rand(31, 47, 5).astype(np.float32) * 255.0
    # a person-box style scale+translate (axis-aligned, non-integer)
    m = np.array([[1.7, 0.0, -3.25], [0.0, 0.6, 4.5]], np.float32)
    fast = np.asarray(geometry.affine_warp_axis_aligned(img, m, (24, 52)))
    ref = np.asarray(geometry.affine_warp(
        img, jnp.asarray(m), (24, 52)))
    np.testing.assert_allclose(fast, ref, atol=2e-3)
