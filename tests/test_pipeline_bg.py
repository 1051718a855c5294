"""End-to-end bg mode on a tiny synthetic clip (chroma seg stand-in to
keep CI light — the neural paths are covered by test_neural_agents)."""
import numpy as np
import pytest

import jax.numpy as jnp

from video_unscreen_tpu.ops import metrics as M
from video_unscreen_tpu.pipeline import run_bg
from tests.test_pipeline_green import make_clip

BG_TEST_CFG = {
    "cuda_device": 0,
    "fg_exist_thr": 0.001,
    "bg_mask": {"thr": 25, "fusion_weight": 0.1},
    "binseg": {"type": "chroma", "input_long_side": 128},
    "stm": {"model_path": "weights/stm.msgpack", "input_long_side": 128,
            "memory_step": 2, "memory_capacity": 4},
    "objectremoval": {
        "score_map_center": {"landscape": [0.5, 0.5],
                             "portrait": [0.6, 0.5]},
        "saliency_thr": 0.00001,
        "consensus_thr": 0.5,
    },
    "trimap": {"input_long_side": 128, "kernelsize": 3, "iters": 3,
               "color_winsize": [10, 100, 180]},
    "vmatting": {"model_path": "weights/matting_unet.msgpack",
                 "input_long_side": 128},
    "data": {"dst_img_dir": "/tmp/unscreen_bg_test_out", "range": None},
}


@pytest.mark.slow
def test_bg_mode_end_to_end():
    frames, gts = make_clip(n=3)
    result = run_bg(BG_TEST_CFG, frames=frames, save=False)
    assert result["numframes"] == 3
    assert len(result["alphas"]) == 3
    mious = [float(M.miou(jnp.asarray(gt, jnp.float32),
                          jnp.asarray(alpha, jnp.float32)))
             for alpha, gt in zip(result["alphas"], gts)]
    for alpha, gt in zip(result["alphas"], gts):
        assert alpha.shape == gt.shape
    # frame 0 runs the full seg -> matting -> bg-difference path; later
    # frames go through the trained STM tracking
    assert mious[0] > 0.8, mious
    assert np.mean(mious) > 0.75, mious
