"""Fused bg pipeline on a tiny synthetic clip (no STM to keep CI light;
the STM branch is covered on the modular path + model tests)."""
import numpy as np
import jax.numpy as jnp

from video_unscreen_tpu.ops import metrics as M
from video_unscreen_tpu.ops.geometry import resize
from video_unscreen_tpu.pipeline.fused_bg import FusedBgPipeline
from tests.test_pipeline_bg import BG_TEST_CFG
from tests.test_pipeline_green import make_clip


def test_fused_bg_quality():
    frames, gts = make_clip(n=4)
    h, w = frames[0].shape[:2]
    pipe = FusedBgPipeline(BG_TEST_CFG, (h, w), work_long_side=128,
                           use_stm_tracking=False)
    alphas, segmasks, fgs, bgs = pipe.run(frames, chunk_size=2)
    assert alphas.shape[0] == 4
    mious = []
    for i, gt in enumerate(gts):
        gt_s = resize(jnp.asarray(gt, jnp.float32), alphas[i].shape)
        mious.append(float(M.miou(gt_s, jnp.asarray(alphas[i],
                                                    jnp.float32))))
    assert np.mean(mious) > 0.6, mious
    # the estimated background must have the subject removed: far from the
    # magenta fg color where the subject was (the bg artifact is the
    # darkened (1-a)*frame fill, reference `bg.py:71-83` semantics)
    subj = np.asarray(gt_s) > 127
    bg_mean = bgs[-1][subj].mean(axis=0)
    fg_color = np.array([150.0, 60.0, 170.0])
    frame_mean = frames[-1][..., :][subj].mean(axis=0)
    assert np.abs(bg_mean - fg_color).mean() > 40, bg_mean
    assert np.abs(bg_mean - frame_mean).mean() > 30, (bg_mean, frame_mean)
