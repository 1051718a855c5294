"""Long-clip STM propagation with the SHIPPED trained weights.

The ring-buffer tests (`test_stm_ring_buffer.py`) pin the bank mechanics
with random weights; this gates propagation *quality* over a clip long
enough that the FIFO bank actually cycles (>= 12 frames,
memory_capacity=10, memory_step=2 — `configs/bg.json` stm section,
reference semantics `unscreen/stm/agent.py:145-168`).
"""
import cv2
import numpy as np
import pytest

from video_unscreen_tpu.agents.stm import STMAgent
from video_unscreen_tpu.ops.metrics import miou


def _drifting_clip(n=14, h=128, w=128, seed=5):
    """Flat-color subject drifting over a textured background — the STM
    training distribution (`parallel/train_stm.py:make_pair_batch`), but a
    full clip instead of a pair."""
    rng = np.random.RandomState(seed)
    small = rng.rand(16, 16, 3).astype(np.float32)
    bg = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC).clip(0, 1)
    fg_color = rng.uniform(0.2, 0.8, 3).astype(np.float32)

    base = np.zeros((h, w), np.float32)
    cv2.ellipse(base, (40, 64), (22, 30), 15, 0, 360, 1.0, -1)

    frames, masks = [], []
    for t in range(n):
        m = np.float32([[1, 0, 3 * t], [0, 1, int(1.5 * t)]])
        alpha = cv2.warpAffine(base, m, (w, h))
        img = alpha[..., None] * fg_color + (1 - alpha[..., None]) * bg
        img += rng.randn(h, w, 3).astype(np.float32) * 0.02
        frames.append((img.clip(0, 1) * 255).astype(np.uint8))
        masks.append((alpha > 0.5).astype(np.uint8) * 255)
    return frames, masks


@pytest.mark.slow
def test_trained_stm_long_clip_propagation():
    frames, gt_masks = _drifting_clip(n=14)
    agent = STMAgent(model_path="weights/stm.msgpack",
                     input_long_side=128, memory_step=2,
                     memory_capacity=10)
    preds = agent.forward(frames, gt_masks[0])
    assert len(preds) == len(frames)

    # the bank cycled: 13 propagated frames, commit every 2 -> 7 commits
    last_miou = float(miou(gt_masks[-1].astype(np.float32),
                                preds[-1].astype(np.float32)))
    mid_miou = float(miou(gt_masks[7].astype(np.float32),
                               preds[7].astype(np.float32)))
    assert mid_miou > 0.8, f"frame 7 MIOU {mid_miou:.3f}"
    assert last_miou > 0.8, f"last-frame MIOU {last_miou:.3f}"
