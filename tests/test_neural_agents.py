"""Neural agent tests (random weights — geometry/shape/contract checks)."""
import numpy as np
import pytest

from video_unscreen_tpu.agents import (HumanSegAgent, SegAgent, STMAgent,
                                       VMattingAgent)


class TestSegAgent:
    def test_forward_contract(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (72, 96, 3)).astype(np.uint8)
        agent = SegAgent(input_long_side=96, crop_h=65, crop_w=65,
                         stride_ratio=0.5, flip=True)
        pred = agent.forward(img)
        assert pred.shape == (72, 96)
        assert set(np.unique(pred)) <= {0, 255}

    def test_crop_grid(self):
        from video_unscreen_tpu.agents.binseg import _crop_grid
        locs = _crop_grid(96, 96, 65, 65, 0.5, flip=True)
        # 2x2 grid x 2 (flip) = 8
        assert len(locs) == 8
        assert sum(1 for l in locs if l[2]) == 4
        for s_h, s_w, _ in locs:
            assert 0 <= s_h <= 96 - 65
            assert 0 <= s_w <= 96 - 65


class TestVMattingAgent:
    def test_forward_contract(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (72, 96, 3)).astype(np.uint8)
        trimap = np.zeros((72, 96), np.uint8)
        trimap[20:52, 30:70] = 255
        trimap[16:20, 26:74] = 128
        alpha_pre = np.zeros((72, 96), np.uint8)
        agent = VMattingAgent(input_long_side=96)
        alpha = agent.forward(img, alpha_pre, trimap)
        assert alpha.shape == (72, 96)
        # hard trimap reset: fg stays 255, bg stays 0
        assert (alpha[trimap == 255] == 255).all()
        assert (alpha[trimap == 0] == 0).all()


class TestSTMAgent:
    def test_forward_contract(self):
        rng = np.random.RandomState(0)
        frames = [rng.randint(0, 256, (64, 80, 3)).astype(np.uint8)
                  for _ in range(3)]
        mask0 = np.zeros((64, 80), np.uint8)
        mask0[16:48, 20:60] = 255
        agent = STMAgent(input_long_side=80, memory_step=2,
                         memory_capacity=4)
        masks = agent.forward(frames, mask0)
        assert len(masks) == 3
        for m in masks:
            assert m.shape == (64, 80)
            assert set(np.unique(m)) <= {0, 255}
        # first frame mask is the input mask
        np.testing.assert_array_equal(masks[0], mask0)


class TestHumanSegAgent:
    def test_forward_contract(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (72, 96, 3)).astype(np.uint8)
        agent = HumanSegAgent(layers=(1, 1, 1, 1), crop_h=65, crop_w=65)
        pred = agent.forward(img)
        assert pred.shape == (72, 96)
        assert set(np.unique(pred)) <= {0, 255}
