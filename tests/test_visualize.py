"""Visualize helpers — parity with `unscreen/utils/visualize.py`."""
import numpy as np

from video_unscreen_tpu.utils.visualize import (fuse_fgbg, get_roi,
                                                highlight_roi, show,
                                                show_dist_hist, tocolor)


def test_fuse_fgbg_endpoints():
    fg = np.full((4, 4, 3), 200, np.uint8)
    bg = np.full((4, 4, 3), 20, np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    mask[:2] = 255
    out = fuse_fgbg(fg, bg, mask)
    assert (out[:2] == 200).all() and (out[2:] == 20).all()


def test_get_roi_blacks_outside():
    img = np.full((4, 4, 3), 100, np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    mask[1, 1] = 255
    out = get_roi(img, mask)
    assert out[1, 1].tolist() == [100, 100, 100]
    assert out[0, 0].tolist() == [0, 0, 0]


def test_highlight_roi_red_overlay():
    """Reference semantics (`visualize.py:48-65`): last channel blended
    toward the mask inside the ROI, untouched outside."""
    img = np.full((2, 2, 3), 60, np.uint8)
    mask = np.array([[255, 0], [0, 0]], np.uint8)
    out = highlight_roi(img, mask)
    assert out[0, 0, 2] == np.uint8(0.5 * 60 + 0.5 * 255)
    assert out[0, 1, 2] == 60
    assert (out[..., :2] == 60).all()  # B,G untouched


def test_tocolor_and_show_headless(tmp_path, monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    g = np.zeros((4, 4), np.uint8)
    c = tocolor(g)
    assert c.shape == (4, 4, 3)
    p = str(tmp_path / "out.png")
    assert show(c, fallback_path=p) == p
    import os.path as osp
    assert osp.exists(p)


def test_show_dist_hist_renders(tmp_path, monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    samples = np.concatenate([np.zeros(50), np.ones(50) * 0.95])
    img = show_dist_hist(samples, num_hist=10,
                         fallback_path=str(tmp_path / "h.png"))
    assert img.shape == (320, 480, 3)
    assert (img != 255).any()  # bars drawn
