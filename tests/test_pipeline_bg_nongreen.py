"""bg mode on NON-green footage — the mode's reason to exist
(VERDICT round-1 item 1; reference `tools/unscreen/bg.py` +
`unscreen/binseg/agent_human.py:262-305`).

A walking person over a textured natural background; frame 0 is seeded by
the trained SCHP human parser, later frames track through the trained STM.
"""
import os.path as osp

import numpy as np
import pytest
import jax.numpy as jnp

from video_unscreen_tpu.ops import metrics as M
from video_unscreen_tpu.parallel.data_synth import make_nongreen_clip

HUMAN_W = "weights/schp_human.msgpack"

NONGREEN_CFG = {
    "cuda_device": 0,
    "fg_exist_thr": 0.001,
    "bg_mask": {"thr": 25, "fusion_weight": 0.1},
    "binseg": {"type": "human", "model_path": HUMAN_W},
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
    "data": {"dst_img_dir": "/tmp/unscreen_bg_nongreen_out", "range": None},
}


@pytest.mark.slow
@pytest.mark.skipif(not osp.exists(HUMAN_W),
                    reason="trained SCHP weights not shipped yet")
def test_bg_mode_nongreen_fused():
    """12 articulated-walk frames at 384 long side (VERDICT round-2
    item 5: long enough to exercise STM tracking over a deforming
    silhouette, not a 3-frame translate)."""
    from video_unscreen_tpu.pipeline.fused_bg import FusedBgPipeline
    frames, gts, _ = make_nongreen_clip(n=12, h=288, w=384, seed=5,
                                        person_scale=0.8, walk=True)
    h, w = frames[0].shape[:2]
    pipe = FusedBgPipeline(NONGREEN_CFG, (h, w), work_long_side=384)
    assert pipe.seg is not None  # SCHP actually seeds the scan
    alphas, segmasks, fgs, bgs = pipe.run(frames, chunk_size=4)
    from video_unscreen_tpu.ops.geometry import resize
    mious = []
    for i, gt in enumerate(gts):
        gt_small = np.asarray(resize(jnp.asarray(gt, jnp.float32),
                                     alphas[i].shape))
        mious.append(float(M.miou(jnp.asarray(gt_small),
                                  jnp.asarray(alphas[i], jnp.float32))))
    # raised 0.8 -> 0.85 in round 4 (VERDICT r3 item 9): measured 0.894
    # mean / 0.898 tail at this geometry, so the gate now has headroom
    # to catch gradual decay instead of sitting 0.6% above the floor
    assert np.mean(mious) > 0.85, mious
    # the tail must hold too — tracking drift over 12 frames fails here
    assert np.mean(mious[-4:]) > 0.85, mious


@pytest.mark.slow
@pytest.mark.skipif(not osp.exists(HUMAN_W),
                    reason="trained SCHP weights not shipped yet")
def test_human_seg_agent_nongreen_frame():
    """HumanSegAgent alone localizes the person on textured background."""
    from video_unscreen_tpu.agents.binseg import HumanSegAgent
    frames, gts, _ = make_nongreen_clip(n=1, h=192, w=256, seed=9,
                                        person_scale=0.8)
    agent = HumanSegAgent(model_path=HUMAN_W)
    pred = agent.forward(frames[0])
    miou = float(M.miou(jnp.asarray(gts[0], jnp.float32),
                        jnp.asarray(pred, jnp.float32)))
    assert miou > 0.8, miou
