"""Agent-level tests on tiny synthetic frames."""
import numpy as np
import pytest

from video_unscreen_tpu.agents import (BackgroundAgent, ColorFilteringAgent,
                                       HarmonizationAgent, TrimapAgent)


def make_greenscreen(h=96, w=128, noise=8, rng=None):
    """Synthetic green-screen frame + person-ish fg + GT alpha."""
    rng = rng or np.random.RandomState(0)
    img = np.zeros((h, w, 3), np.float32)
    img[...] = (40, 190, 50)  # BGR greenish
    alpha = np.zeros((h, w), np.float32)
    # torso
    alpha[30:86, 44:84] = 255
    # head
    yy, xx = np.mgrid[0:h, 0:w]
    alpha[(yy - 24) ** 2 + (xx - 64) ** 2 < 14 ** 2] = 255
    fg_color = np.array((150, 60, 170), np.float32)
    a = (alpha / 255.0)[..., None]
    img = img * (1 - a) + fg_color * a
    img += rng.randn(h, w, 3).astype(np.float32) * noise
    img = img.clip(0, 255)
    return img.astype(np.uint8), alpha.astype(np.uint8)


class TestColorFiltering:
    def test_fit_and_predict(self):
        img, gt = make_greenscreen()
        agent = ColorFilteringAgent(input_long_side=128)
        # coarse mask = GT dilated a bit (as a segmenter would give)
        coarse = gt.copy()
        alpha, bg_img, conf = agent.forward(img, coarse, iters=2)
        assert agent.is_trained()
        inter = ((alpha > 127) & (gt > 127)).sum()
        union = ((alpha > 127) | (gt > 127)).sum()
        assert inter / union > 0.85, f"IoU {inter / union}"
        # bg color should be greenish (G dominant in BGR)
        bg_px = bg_img[0, 0].astype(int)
        assert bg_px[1] > bg_px[0] and bg_px[1] > bg_px[2], bg_px

    def test_predict_only_after_training(self):
        img, gt = make_greenscreen()
        agent = ColorFilteringAgent(input_long_side=128)
        agent.forward(img, gt, iters=1)
        alpha, _, _ = agent.forward(img, gt, iters=0)
        inter = ((alpha > 127) & (gt > 127)).sum()
        union = ((alpha > 127) | (gt > 127)).sum()
        assert inter / union > 0.8

    def test_degenerate_no_fg(self):
        img, _ = make_greenscreen()
        empty = np.zeros(img.shape[:2], np.uint8)
        agent = ColorFilteringAgent(input_long_side=128)
        alpha, bg_img, conf = agent.forward(img, empty, iters=1)
        np.testing.assert_array_equal(alpha, empty)
        np.testing.assert_array_equal(bg_img, img)
        assert conf == 1.0
        assert not agent.is_trained()

    def test_degenerate_no_bg(self):
        img, _ = make_greenscreen()
        full = np.full(img.shape[:2], 255, np.uint8)
        agent = ColorFilteringAgent(input_long_side=128)
        alpha, bg_img, _ = agent.forward(img, full, iters=1)
        np.testing.assert_array_equal(alpha, full)
        assert bg_img.sum() == 0


class TestTrimapAgent:
    def test_mask_only(self):
        _, gt = make_greenscreen()
        agent = TrimapAgent(input_long_side=128)
        tri = agent.forward(gt)
        assert set(np.unique(tri)) <= {0, 128, 255}
        # unknown band surrounds the fg boundary
        assert (tri == 128).sum() > 0
        assert (tri == 255).sum() > 0
        assert (tri == 0).sum() > 0

    def test_withbg(self):
        img, gt = make_greenscreen()
        agent = TrimapAgent(input_long_side=128)
        tri = agent.forward(gt, img, np.array([40, 190, 50], np.uint8))
        assert set(np.unique(tri)) <= {0, 128, 255}


class TestBackgroundAgent:
    @pytest.mark.parametrize("method", ["mean", "rf", "pcov"])
    def test_inpaint_flat_bg(self, method):
        img, gt = make_greenscreen(noise=2)
        agent = BackgroundAgent(input_long_side=128)
        bg = agent.forward(img, gt, method=method)
        assert bg.shape == img.shape
        # inpainted hole should be close to the true bg color
        hole = gt > 0
        err = np.abs(bg[hole].astype(float)
                     - np.array([40, 190, 50])).mean()
        assert err < 40, f"{method}: {err}"

    def test_no_fg_passthrough(self):
        img, _ = make_greenscreen()
        agent = BackgroundAgent(input_long_side=128)
        out = agent.forward(img, np.zeros(img.shape[:2], np.uint8))
        np.testing.assert_array_equal(out, img)


class TestHarmonizationAgent:
    def test_foreground_toning_moves_means(self):
        rng = np.random.RandomState(1)
        fg = rng.randint(100, 200, (48, 64, 3)).astype(np.uint8)
        bg = np.full((48, 64, 3), 40, np.uint8)  # dark background
        alpha = np.full((48, 64), 255, np.uint8)
        agent = HarmonizationAgent()
        toned = agent.foreground_toning(fg, bg, alpha)
        # L should shift toward the darker bg
        assert toned.mean() < fg.mean()

    def test_alpha_smoothing(self):
        alpha = np.zeros((64, 64), np.uint8)
        alpha[16:48, 16:48] = 255
        agent = HarmonizationAgent()
        sm = agent.alpha_smoothing(alpha, iters=3, ksize=3,
                                   target_long_side=64)
        assert sm.shape == alpha.shape
        # edges got softened
        assert ((sm > 0) & (sm < 255)).sum() > 0
