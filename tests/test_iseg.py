"""Interactive segmentation agent tests."""
import numpy as np
import pytest

from video_unscreen_tpu.agents.iseg import Clicker, ISegAgent


class TestClicker:
    def test_click_maps(self):
        clicker = Clicker((32, 32), click_radius=1)
        clicker.add_click(True, 10, 12)
        clicker.add_click(False, 20, 20)
        pos, neg = clicker.get_clicks_maps()
        assert pos[10, 12] == 1.0 and pos[11, 13] == 1.0
        assert neg[20, 20] == 1.0
        assert pos[20, 20] == 0.0

    def test_points_tensor_padding(self):
        clicker = Clicker((32, 32))
        clicker.add_click(True, 5, 6)
        pts = clicker.points_tensor(4)
        assert pts.shape == (4, 3)
        np.testing.assert_array_equal(pts[0], (1.0, 5.0, 6.0))
        assert (pts[1:, 1] < 0).all()


class TestISegAgent:
    def test_forward_contract(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
        agent = ISegAgent(input_long_side=64, with_flip=True)
        mask = agent.forward(img, [(True, 24, 32)])
        assert mask.shape == (48, 64)
        assert set(np.unique(mask)) <= {0, 255}

    def test_forward_brs(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
        agent = ISegAgent(input_long_side=64, with_brs=True,
                          with_flip=False, brs_maxiter=3)
        mask = agent.forward(img, [(True, 24, 32), (False, 5, 5)])
        assert mask.shape == (48, 64)
        assert set(np.unique(mask)) <= {0, 255}


class TestBRSFunctional:
    """BRS must make the prediction agree with the clicks — the defining
    property of `brs/brs_optimizer.py:97-105` (early exit on click
    satisfaction) — using the shipped trained weights."""

    def _scene(self):
        import cv2
        rng = np.random.RandomState(3)
        h = w = 128
        small = rng.rand(16, 16, 3).astype(np.float32)
        bg = cv2.resize(small, (w, h),
                        interpolation=cv2.INTER_CUBIC).clip(0, 1)
        mask = np.zeros((h, w), np.float32)
        cv2.ellipse(mask, (64, 64), (36, 28), 20, 0, 360, 1.0, -1)
        img = (mask[..., None] * np.array([0.2, 0.5, 0.8], np.float32)
               + (1 - mask[..., None]) * bg)
        return (img.clip(0, 1) * 255).astype(np.uint8)

    def test_brs_click_satisfaction_and_loss_reduction(self):
        img = self._scene()
        agent = ISegAgent(model_path="weights/iseg.msgpack",
                          input_long_side=128, with_brs=True,
                          with_flip=False, brs_maxiter=20)
        # positive in the subject; negative INSIDE the blob — the user
        # carves out a region the model confidently calls foreground, so
        # the plain prediction must miss it and BRS must fix it
        clicks = [(True, 64, 50), (False, 64, 88)]
        p_plain = agent.predict_probs(img, clicks, use_brs=False)
        p_brs = agent.predict_probs(img, clicks, use_brs=True)

        def miss_loss(p):
            return (1.0 - p[64, 50]) ** 2 + p[64, 88] ** 2

        # the scenario is adversarial by construction
        assert p_plain[64, 88] > 0.5
        # post-BRS click satisfaction: positives in, negatives out
        assert p_brs[64, 50] > 0.5
        assert p_brs[64, 88] < 0.5
        # BRS strictly reduces the click-miss loss
        assert miss_loss(p_brs) < miss_loss(p_plain)

    def test_brs_preserves_subject_iou(self):
        """BRS corrections are local — the subject away from the negative
        click stays segmented (scale/bias must not zero the output)."""
        img = self._scene()
        agent = ISegAgent(model_path="weights/iseg.msgpack",
                          input_long_side=128, with_brs=True,
                          with_flip=False, brs_maxiter=20)
        mask = agent.forward(img, [(True, 64, 50), (False, 64, 88)])
        # left half of the ellipse (around the positive click) remains fg
        assert (mask[56:72, 44:58] == 255).mean() > 0.8


class TestInsertionModes:
    """All three BRS insertion points run and honor the click contract
    (`brs_predictor.py:143-162`: after_aspp / after_c4 / after_deeplab)."""

    @pytest.mark.parametrize("mode",
                             ["after_aspp", "after_c4", "after_deeplab"])
    def test_forward_runs(self, mode):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
        agent = ISegAgent(input_long_side=64, with_brs=True,
                          with_flip=False, brs_maxiter=2,
                          insertion_mode=mode)
        mask = agent.forward(img, [(True, 24, 32)])
        assert mask.shape == (48, 64)
        assert set(np.unique(mask)) <= {0, 255}

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError):
            ISegAgent(input_long_side=64, insertion_mode="after_nothing")
