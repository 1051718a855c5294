"""Motion-blur gate for green mode (VERDICT r4 item 3).

The round-4 protocol recorded green_mblur MIOU 0.7785 at the 960
operating point — the only green clip below 0.97. Two mitigations ship
this round:

  - the matting UNet is fine-tuned on directionally-blurred composites
    (`parallel/data_synth.make_batch` blur augmentation: fg AND alpha
    blurred by up to ~8% of the crop width, trimap band widened to
    cover the ramp), so the net predicts the soft ramp instead of
    hedging on bands it never trained on;
  - the fused green trimap band widens OUTWARD (dilate side only) when
    the mask centroid displacement exceeds 2x/4x the band iters
    (`FusedGreenPipeline._band_tier`/`_gen_trimap`) — the blur ramp
    extends ~disp/2 past the binarized boundary, outside the default
    band where the net cannot predict at all
    (`unscreen/vmatting/agent.py:128-131` hard reset).

This gate runs the SAME clip the eval protocol calls green_mblur
(`tools/make_eval_set.py`: kind=green, seed=23, variant=motion_blur) at
reduced resolution and asserts the protocol floor, plus a plain-clip
no-regression bound with the adaptive band ON.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from video_unscreen_tpu.ops import metrics as M
from video_unscreen_tpu.ops.geometry import resize
from video_unscreen_tpu.parallel.data_synth import make_eval_clip
from video_unscreen_tpu.pipeline.fused_green import FusedGreenPipeline

W = 288

MBLUR_CFG = {
    "cuda_device": 0,
    "colorfiltering_update_duration": 30,
    "colorfiltering_train_iters": 2,
    "fg_exist_thr": 0.001,
    "binseg": {"type": "chroma", "input_long_side": W},
    "colorfiltering": {"input_long_side": W, "bg_ncomp": [3, 5, 5],
                       "fg_ncomp": [10, 10, 10],
                       "max_num_samples": 10000,
                       "color_prior_winsize": 30},
    "objectremoval": {"score_map_center": {"landscape": [0.5, 0.5],
                                           "portrait": [0.6, 0.5]},
                      "saliency_thr": 0.005, "consensus_thr": 0.5},
    "trimap": {"input_long_side": W, "kernelsize": 3, "iters": 3,
               "color_winsize": [10, 100, 180]},
    "vmatting": {"model_path": "weights/matting_unet.msgpack",
                 "input_long_side": W},
    "data": {"dst_img_dir": "/tmp/unscreen_mblur_test", "range": None},
}


def _mean_miou(alphas, gts):
    mious = []
    for i, gt in enumerate(gts):
        gt_s = resize(jnp.asarray(gt, jnp.float32), alphas[i].shape)
        mious.append(float(M.miou(gt_s, jnp.asarray(alphas[i],
                                                    jnp.float32))))
    return float(np.mean(mious))


@pytest.mark.slow
def test_green_motion_blur_gate():
    frames, gts = make_eval_clip("green", n=8, h=162, w=288, seed=23,
                                 variant="motion_blur")
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(MBLUR_CFG, (h, w), work_long_side=W)
    assert pipe.tri_adaptive  # the displacement-adaptive band is wired
    alphas, _, _ = pipe.run(frames, chunk_size=4)
    m = _mean_miou(alphas, gts)
    # measured 0.874 at this geometry with the blur-trained net +
    # adaptive band (VERDICT r4 item 3 floor: >= 0.85 at test geometry)
    assert m > 0.85, m


@pytest.mark.slow
def test_green_plain_not_regressed_by_adaptive_band():
    """The adaptive band triggers on fast SHARP movers too (displacement
    is its only signal) — the widened outward band must not cost the
    plain walker clip."""
    frames, gts = make_eval_clip("green", n=8, h=162, w=288, seed=4,
                                 variant="plain")
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(MBLUR_CFG, (h, w), work_long_side=W)
    alphas, _, _ = pipe.run(frames, chunk_size=4)
    m = _mean_miou(alphas, gts)
    assert m > 0.93, m
