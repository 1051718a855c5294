"""Streaming always-bg EMA must not permanently suppress a static subject
(ADVICE round-4 medium).

Trap being tested: a frame-wide alpha zeroing folds the subject into the
EMA (`FusedBgPipeline._bg_model_update`); afterwards the bg-difference
diff is ~0 over the subject, so alphabg = 0 -> alpha_ensm = 0 -> alpha =
0 keeps reinforcing the EMA with no recovery path. The fix: pixels the
current segmask calls foreground never update the EMA, and where the
seed disputes a previously-seen EMA pixel while nothing is tracked, the
EMA blends toward the per-frame regionfill estimate so the diff
re-acquires the subject within a few frames.
"""
import numpy as np
import jax
import jax.numpy as jnp

from video_unscreen_tpu.pipeline.fused_bg import FusedBgPipeline
from tests.test_pipeline_bg import BG_TEST_CFG
from tests.test_pipeline_green import make_clip


def _static_clip(n=6):
    """The make_clip blob, pinned static (cx fixed via t=0 frames)."""
    frames, gts = make_clip(n=1)
    return [frames[0].copy() for _ in range(n)], [gts[0]] * n


def test_ema_poisoned_with_subject_recovers():
    frames, gts = _static_clip(n=6)
    h, w = frames[0].shape[:2]
    # pack_d2h off: the test reads the raw (alpha, segmask) plane pair
    # from ys (the packed wire's bit-plane layout is covered by
    # tests/test_wirepack.py and the fused_bg host-fetch gate)
    pipe = FusedBgPipeline(BG_TEST_CFG, (h, w), work_long_side=128,
                           use_stm_tracking=False, pack_d2h=False)

    # poison the EMA as if the subject had been missed and absorbed:
    # bg_model IS the frame (subject included), every pixel "seen",
    # nothing tracked — the exact self-reinforcing state of the trap
    carry = pipe.init_carry()
    frame_w = np.asarray(jax.device_get(
        pipe._prep_frame(jnp.asarray(frames[0], jnp.float32))))
    carry = carry._replace(
        bg_model=jnp.asarray(frame_w, jnp.float32),
        bg_seen=jnp.ones(pipe.work_hw, jnp.float32))

    mean_alphas = []
    for f in frames:
        chunk = jnp.asarray(np.asarray(f, np.uint8)[None])
        carry, (packed, _) = pipe.process_chunk(carry, chunk)
        mean_alphas.append(float(np.asarray(packed)[0, ..., 0].mean()))

    gt_mean = float(np.asarray(gts[0], np.float32).mean())
    # the chroma seed finds the subject every frame; the recovery blend
    # must bring the matte back within a few frames of the poisoned start
    assert mean_alphas[-1] > 0.5 * gt_mean, mean_alphas
    # and the recovered state must persist, not oscillate
    assert mean_alphas[-1] >= 0.9 * max(mean_alphas), mean_alphas


def test_ema_not_fed_by_segmask_foreground():
    """Pixels the current segmask calls foreground must not enter the
    EMA even when the matte zeroes them (the reinforcement half of the
    trap)."""
    frames, _ = _static_clip(n=2)
    h, w = frames[0].shape[:2]
    pipe = FusedBgPipeline(BG_TEST_CFG, (h, w), work_long_side=128,
                           use_stm_tracking=False)
    carry = pipe.init_carry()
    frame = pipe._prep_frame(jnp.asarray(frames[0], jnp.float32))
    segmask = jnp.where(
        jnp.arange(pipe.work_hw[1])[None, :] < pipe.work_hw[1] // 2,
        255.0, 0.0) * jnp.ones(pipe.work_hw)
    alpha = jnp.zeros(pipe.work_hw, jnp.float32)  # matte missed it all
    bgimg = jnp.zeros(pipe.work_hw + (3,), jnp.float32)
    bg_model, bg_seen = pipe._bg_model_update(carry, frame, alpha,
                                              segmask, bgimg)
    seen = np.asarray(bg_seen)
    assert (seen[:, : pipe.work_hw[1] // 2] == 0).all()  # seg-fg half
    assert (seen[:, pipe.work_hw[1] // 2:] == 1).all()  # true-bg half
