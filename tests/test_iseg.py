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
