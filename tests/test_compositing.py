"""Golden tests: compositing / chroma ops vs reference semantics."""
import cv2
import numpy as np

from video_unscreen_tpu.ops import compositing


def test_is_pixel_inrange_color(rng):
    img = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    bg_color = np.array([40, 200, 60], np.uint8)  # greenish BGR
    ours = np.asarray(compositing.is_pixel_inrange(
        img.astype(np.float32), bg_color.astype(np.float32), (20, 20, 120)))
    # reference path (fgfuncs.py:54-64)
    img_hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    bg_hsv = cv2.cvtColor(bg_color[None, None], cv2.COLOR_BGR2HSV).squeeze()
    win = np.array((20, 20, 120)) // 2
    lower = np.clip(bg_hsv.astype(int) - win, 10, 255)
    upper = np.clip(bg_hsv.astype(int) + win, 10, 255)
    ref = cv2.inRange(img_hsv, lower.astype(np.uint8),
                      upper.astype(np.uint8)) > 0
    # uint8-rounding at window edges may flip isolated pixels
    assert (ours != ref).mean() < 0.02


def test_get_fg_reference_equation(rng):
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    bg = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    alpha = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    ours = np.asarray(compositing.get_fg(
        img.astype(np.float32), alpha.astype(np.float32),
        bg.astype(np.float32)))
    img_hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    bg_hsv = cv2.cvtColor(bg, cv2.COLOR_BGR2HSV).astype(np.float32)
    a = (alpha.astype(np.float32) / 255.0)[..., None]
    fg_hsv = np.clip(img_hsv - (1 - a) * bg_hsv, 0, 255).astype(np.uint8)
    ref = cv2.cvtColor(fg_hsv, cv2.COLOR_HSV2BGR).astype(np.float32)
    assert np.abs(ours - ref).mean() < 6.0  # uint8 HSV quantization


def test_get_fg_naive(rng):
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.float32)
    alpha = rng.randint(0, 256, (8, 8)).astype(np.float32)
    out = np.asarray(compositing.get_fg_naive(img, alpha))
    np.testing.assert_allclose(out, img * (alpha / 255.0)[..., None],
                               rtol=1e-5)


def test_exist_foreground():
    mask = np.zeros((100, 100), np.float32)
    assert not bool(compositing.exist_foreground(mask, 0.001))
    mask[:20, :20] = 255.0
    assert bool(compositing.exist_foreground(mask, 0.001))


def test_composite_fgbg(rng):
    fg = rng.randint(0, 256, (40, 60, 3)).astype(np.float32)
    bg = rng.randint(0, 256, (30, 50, 3)).astype(np.float32)
    alpha = (rng.rand(40, 60) * 255).astype(np.float32)
    out = np.asarray(compositing.composite_fgbg(fg, alpha, bg))
    assert out.shape == (40, 60, 3)
    assert out.min() >= 0 and out.max() <= 255
    # where alpha > 0.9*255 the composite is pure fg
    hard = alpha / 255.0 > 0.9
    np.testing.assert_allclose(out[hard], fg[hard], atol=1e-3)


def test_color_correct_suppresses_bg_tint(rng):
    h, w = 64, 96
    img = np.zeros((h, w, 3), np.float32)
    img[...] = (40, 200, 60)  # green background
    img[20:44, 30:60] = (200, 50, 180)  # magenta-ish subject
    alpha = np.zeros((h, w), np.float32)
    alpha[20:44, 30:60] = 255.0
    alpha[10:16, 10:16] = 200.0  # stray alpha on pure background
    out = np.asarray(compositing.color_correct(
        img, alpha, np.array([40, 200, 60], np.float32), 96))
    assert out.shape == (h, w)
    # subject survives, stray background-colored alpha is suppressed
    assert out[20:44, 30:60].mean() > 200.0
    assert out[10:16, 10:16].mean() < alpha[10:16, 10:16].mean() * 0.5
