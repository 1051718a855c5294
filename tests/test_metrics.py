"""Golden tests: metrics vs numpy/cv2 reference formulas."""
import cv2
import numpy as np

from video_unscreen_tpu.ops import metrics


def _rand_alpha(rng, h=64, w=80):
    a = np.zeros((h, w), np.uint8)
    a[16:48, 20:60] = 255
    a = cv2.GaussianBlur(a, (15, 15), 5)
    return a


def test_miou(rng):
    gt = _rand_alpha(rng)
    pred = np.roll(gt, 3, axis=0)
    ours = float(metrics.miou(gt.astype(np.float32), pred.astype(np.float32)))
    h, w = gt.shape
    fg_i = ((pred > 127) & (gt > 127)).sum()
    fg_u = ((pred > 127) | (gt > 127)).sum()
    bg_i = ((pred < 128) & (gt < 128)).sum()
    bg_u = ((pred < 128) | (gt < 128)).sum()
    ref = (fg_i / fg_u + bg_i / bg_u) / 2
    assert abs(ours - ref) < 1e-5


def test_miou_empty_guard():
    gt = np.zeros((50, 50), np.float32)
    pred = np.zeros((50, 50), np.float32)
    assert float(metrics.miou(gt, pred)) == 1.0


def test_sad_mse(rng):
    gt = _rand_alpha(rng).astype(np.float32)
    pred = np.clip(gt + rng.randn(*gt.shape) * 20, 0, 255).astype(np.float32)
    ref_sad = np.abs((pred - gt) / 255.0).sum() / np.sqrt(gt.size)
    ref_mse = (((pred - gt) / 255.0) ** 2).sum() / 1000
    assert abs(float(metrics.sad(gt, pred)) - ref_sad) < 1e-3
    assert abs(float(metrics.mse(gt, pred)) - ref_mse) < 1e-3


def test_gradient_error(rng):
    gt = _rand_alpha(rng).astype(np.float64)
    pred = np.roll(gt, 2, axis=1).astype(np.float64)
    ours = float(metrics.gradient_error(
        gt.astype(np.float32), pred.astype(np.float32)))

    # reference formula (metrics.py:102-123, 202-249)
    sigma, eps = 1.4, 1e-2
    half = np.ceil(sigma * np.sqrt(-2 * np.log(np.sqrt(2 * np.pi) * sigma * eps)))
    size = int(2 * half + 1)
    i = np.arange(size) - half
    g = np.exp(-i ** 2 / (2 * sigma ** 2)) / (sigma * np.sqrt(2 * np.pi))
    dg = -i * g / sigma ** 2
    fx = g[:, None] * dg[None, :]
    fx /= np.sqrt((fx ** 2).sum())
    fy = fx.T

    def gg(img):
        gxx = cv2.filter2D(img, -1, fx, borderType=cv2.BORDER_REPLICATE)
        gyy = cv2.filter2D(img, -1, fy, borderType=cv2.BORDER_REPLICATE)
        return np.sqrt(gxx ** 2 + gyy ** 2)

    gtn = (gt - gt.min()) / (gt.max() - gt.min())
    pn = (pred - pred.min()) / (pred.max() - pred.min())
    ref = (((gg(gtn) - gg(pn)) ** 2).sum()) / 1000
    assert abs(ours - ref) / max(ref, 1e-9) < 0.02


def test_connectivity_error(rng):
    gt = _rand_alpha(rng)
    pred = np.clip(gt.astype(int) + (rng.rand(*gt.shape) * 40 - 20), 0,
                   255).astype(np.uint8)
    ours = float(metrics.connectivity_error(
        gt.astype(np.float32), pred.astype(np.float32)))

    # reference formula (metrics.py:126-173)
    a = gt.astype(np.float32) / 255
    p = pred.astype(np.float32) / 255
    steps = np.arange(0, 1.1, 0.1)
    rdm = -np.ones_like(a)
    for i in range(1, len(steps)):
        inter = ((a >= steps[i]) & (p >= steps[i])).astype(np.uint8)
        _, out, stats, _ = cv2.connectedComponentsWithStats(inter, connectivity=4)
        size = stats[1:, -1]
        omega = np.zeros_like(a)
        if len(size):
            omega[out == np.argmax(size) + 1] = 1
        m = (rdm == -1) & (omega == 0)
        rdm[m] = steps[i - 1]
    rdm[rdm == -1] = 1
    a_phi = 1 - (a - rdm) * ((a - rdm) >= 0.15)
    p_phi = 1 - (p - rdm) * ((p - rdm) >= 0.15)
    ref = np.abs(a_phi - p_phi).sum() / 1000
    assert abs(ours - ref) / max(ref, 1e-9) < 0.02


def test_roi_sad(rng):
    gt = _rand_alpha(rng)
    pred = np.roll(gt, 1, axis=0)
    val = float(metrics.roi_sad(gt.astype(np.float32),
                                pred.astype(np.float32)))
    assert 0 <= val < 1.0
