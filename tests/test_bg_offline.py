"""bg_step (offline) mode through the fused compiled-scan stages
(VERDICT round-2 item 6; reference `tools/unscreen/bg_offline.py:51-177`).

Covers: stage 1+2+3 end-to-end quality, the artifact contract
(segmask_/bg_/alphamask_/fg_*.jpg + always_bg.jpg), and the
artifact-store resume (stage 3 re-run from disk alone).
"""
import os
import os.path as osp
from glob import glob

import numpy as np
import pytest
import jax.numpy as jnp

from video_unscreen_tpu.ops import metrics as M
from video_unscreen_tpu.pipeline.bg_offline import run
from tests.test_pipeline_bg import BG_TEST_CFG
from tests.test_pipeline_green import make_clip


@pytest.mark.slow
def test_bg_offline_fused_stages(tmp_path):
    cfg = dict(BG_TEST_CFG)
    cfg["data"] = {"dst_img_dir": str(tmp_path), "range": None,
                   "dst_vid_dir": str(tmp_path), "video_id": "t"}
    frames, gts = make_clip(n=4)
    result = run(cfg, frames=frames, save=True, stages=(1, 2, 3),
                 fused=True, work_long_side=128, chunk_size=2,
                 use_stm_tracking=False)
    assert result["numframes"] == 4
    assert len(result["alphas"]) == 4

    # artifact contract (`bg_offline.py:57-58,96-102` equivalents)
    for kind in ("segmask", "bg", "alphamask", "fg"):
        found = sorted(glob(osp.join(str(tmp_path), f"{kind}_*.jpg")))
        assert len(found) == 4, (kind, found)
    assert osp.exists(osp.join(str(tmp_path), "always_bg.jpg"))

    from video_unscreen_tpu.ops.geometry import resize
    mious = []
    for alpha, gt in zip(result["alphas"], gts):
        gt_s = np.asarray(resize(jnp.asarray(gt, jnp.float32), alpha.shape))
        mious.append(float(M.miou(jnp.asarray(gt_s),
                                  jnp.asarray(alpha, jnp.float32))))
    assert np.mean(mious) > 0.6, mious

    # the stage-1 EMA artifact pair ships with the store (stage 3
    # prefers it over the stage-2 mean where seen — VERDICT r4 item 1)
    assert osp.exists(osp.join(str(tmp_path), "ema_bg.png"))
    assert osp.exists(osp.join(str(tmp_path), "ema_seen.png"))

    # stage-3-only resume: everything reloaded from the artifact store
    # (`bg_offline.py:134-139` semantics), incl. the EMA pair
    result3 = run(cfg, frames=frames, save=False, stages=(3,),
                  fused=True, work_long_side=128, chunk_size=2,
                  use_stm_tracking=False)
    assert len(result3["alphas"]) == 4
    mious3 = []
    for alpha, gt in zip(result3["alphas"], gts):
        gt_s = np.asarray(resize(jnp.asarray(gt, jnp.float32), alpha.shape))
        mious3.append(float(M.miou(jnp.asarray(gt_s),
                                   jnp.asarray(alpha, jnp.float32))))
    assert np.mean(mious3) > 0.6, mious3
    # (the resume replays from the artifact store: segmask/bg round-trip
    # JPEG, so bit-exactness with the in-memory pass is not a contract —
    # the EMA pair itself is PNG/lossless)


@pytest.mark.slow
@pytest.mark.skipif(not osp.exists("weights/schp_human.msgpack"),
                    reason="trained SCHP weights not shipped yet")
def test_bg_offline_occluder_gate():
    """bg_step on the occluder clip (VERDICT r4 item 1: the offline mode
    scored 0.68 at the protocol point vs streaming's 0.91 because its
    stages consumed no streaming-EMA evidence). With the stage-1 EMA
    threaded into the stage-3 fusion, measured at this geometry:
    0.739 -> 0.854 mean MIOU (streaming bg measures 0.833 on the same
    clip — offline now upper-bounds streaming, as it must)."""
    from video_unscreen_tpu.ops.geometry import resize
    from video_unscreen_tpu.parallel.data_synth import make_eval_clip
    from tests.test_bg_occluder import OCCL_CFG

    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in OCCL_CFG.items()}
    cfg["data"] = {"dst_img_dir": "/tmp/unscreen_bgstep_occl_out",
                   "range": None,
                   "dst_vid_dir": "/tmp/unscreen_bgstep_occl_out",
                   "video_id": "t"}
    frames, gts = make_eval_clip("natural", n=12, h=162, w=288, seed=41,
                                 variant="occluder")
    result = run(cfg, frames=frames, save=True, stages=(1, 2, 3),
                 fused=True, work_long_side=288, chunk_size=4,
                 use_stm_tracking=True)
    mious = []
    for alpha, gt in zip(result["alphas"], gts):
        gt_s = np.asarray(resize(jnp.asarray(gt, jnp.float32),
                                 np.asarray(alpha).shape))
        mious.append(float(M.miou(jnp.asarray(gt_s),
                                  jnp.asarray(alpha, jnp.float32))))
    assert np.mean(mious) > 0.80, mious
