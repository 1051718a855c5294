"""Tests: regionfill CG solver vs the reference sparse solve."""
import numpy as np
from scipy import sparse
from scipy.sparse.linalg import spsolve

from video_unscreen_tpu.ops import regionfill as _rf_module  # noqa: F401
from video_unscreen_tpu.ops.regionfill import regionfill as _regionfill


class rf:  # keep call sites terse
    regionfill = staticmethod(_regionfill)


def _ref_regionfill(img, mask):
    """Reference Laplacian fill re-derived with scipy (region_fill.py:26-63)."""
    h, w = img.shape
    hole = mask > 0
    # perimeter = cross-dilate & ~mask
    per = np.zeros_like(hole)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1), (0, 0)):
        shifted = np.zeros_like(hole)
        ys = slice(max(dy, 0), h + min(dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        ys2 = slice(max(-dy, 0), h + min(-dy, 0))
        xs2 = slice(max(-dx, 0), w + min(-dx, 0))
        shifted[ys2, xs2] = hole[ys, xs]
        per |= shifted
    per &= ~hole

    idx = -np.ones((h, w), int)
    ys, xs = np.where(hole)
    idx[ys, xs] = np.arange(len(ys))
    nn = np.full((h, w), 4.0)
    nn[0, :] -= 1; nn[-1, :] -= 1; nn[:, 0] -= 1; nn[:, -1] -= 1
    rows, cols, vals = [], [], []
    b = np.zeros(len(ys))
    for k, (y, x) in enumerate(zip(ys, xs)):
        rows.append(k); cols.append(k); vals.append(nn[y, x])
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w:
                if hole[ny, nx]:
                    rows.append(k); cols.append(idx[ny, nx]); vals.append(-1.0)
                elif per[ny, nx]:
                    b[k] += img[ny, nx]
    A = sparse.coo_matrix((vals, (rows, cols))).tocsr()
    sol = spsolve(A, b)
    out = img.astype(float).copy()
    out[ys, xs] = sol
    return out


def test_regionfill_matches_sparse_solve(rng):
    img = (rng.rand(48, 64) * 255).astype(np.float32)
    # smooth it so the membrane is a good model
    img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3.0
    mask = np.zeros((48, 64), np.float32)
    mask[12:30, 20:44] = 1.0
    img_holed = img.copy()
    img_holed[mask > 0] = 0.0
    ours = np.asarray(rf.regionfill(img_holed, mask, 1.0))
    ref = _ref_regionfill(img_holed, mask)
    assert np.abs(ours - ref).max() < 0.5
    # known pixels untouched
    np.testing.assert_array_equal(ours[mask == 0], img_holed[mask == 0])


def test_regionfill_constant_region():
    img = np.full((32, 32), 77.0, np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:20, 8:20] = 1.0
    holed = img.copy()
    holed[mask > 0] = 0.0
    out = np.asarray(rf.regionfill(holed, mask, 1.0))
    np.testing.assert_allclose(out, img, atol=0.1)


def test_regionfill_empty_mask():
    img = np.arange(100, dtype=np.float32).reshape(10, 10)
    mask = np.zeros((10, 10), np.float32)
    out = np.asarray(rf.regionfill(img, mask, 1.0))
    np.testing.assert_array_equal(out, img)


def test_regionfill_downscaled():
    img = np.tile(np.linspace(0, 255, 64, dtype=np.float32), (64, 1))
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1.0
    holed = img.copy()
    holed[mask > 0] = 0.0
    out = np.asarray(rf.regionfill(holed, mask, 0.5))
    # linear gradient should be reconstructed approximately
    assert np.abs(out - img)[mask > 0].mean() < 12.0
