"""Frame-parallel (multi-chip) fused pipelines over the 8-device CPU mesh.

Covers both S == data-axis devices and S = 2x devices (each device
advances a block of segments in lockstep via `_step_batched`) — the
contract `process_segments` documents ("S divisible by mesh data").
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.pipeline.fused_green import FusedGreenPipeline
from video_unscreen_tpu.pipeline.fused_bg import FusedBgPipeline
from tests.test_pipeline_green import TEST_CFG, make_clip
from tests.test_pipeline_bg import BG_TEST_CFG


def assert_artifacts_close(par, seq, max_bad_frac=1e-3):
    """Sharded-vs-sequential agreement for uint8 artifacts: the batched
    step fuses GMM fit/predict via vmap+select (vs the per-sample cond),
    which moves a handful of boundary pixels by a few uint8 steps — but a
    dropped/misrouted segment would mismatch wholesale. Require <0.1% of
    pixels to differ by more than 2."""
    diff = np.abs(np.asarray(par, np.int32) - np.asarray(seq, np.int32))
    bad = (diff > 2).mean()
    assert bad < max_bad_frac, (bad, diff.max())


@pytest.mark.parametrize("n_seg,seg_len", [(4, 2), (8, 2)])
def test_segments_match_sequential(n_seg, seg_len):
    frames, _ = make_clip(n=n_seg * seg_len)
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128,
                              fetch_fg="device")
    # n_seg segments x seg_len frames over the data axis (4 data devices)
    mesh = make_mesh(8)  # (data=4, model=2)
    segs = jnp.asarray(np.stack(frames).reshape(n_seg, seg_len, h, w, 3))
    packed_par, bg_par = pipe.process_segments(mesh, segs)
    assert packed_par.shape[:2] == (n_seg, seg_len)

    # sequential reference: each segment scanned independently
    for s in range(n_seg):
        _, (packed_seq, bg_seq) = pipe.process_chunk(
            pipe.init_carry(), segs[s])
        assert_artifacts_close(packed_par[s], packed_seq)
        np.testing.assert_allclose(np.asarray(bg_par[s]),
                                   np.asarray(bg_seq), atol=1e-2)


@pytest.mark.parametrize("n_seg,seg_len", [(8, 2)])
def test_bg_segments_match_sequential(n_seg, seg_len):
    frames, _ = make_clip(n=n_seg * seg_len)
    h, w = frames[0].shape[:2]
    pipe = FusedBgPipeline(BG_TEST_CFG, (h, w), work_long_side=128,
                           use_stm_tracking=False, fetch="device")
    mesh = make_mesh(8)
    segs = jnp.asarray(np.stack(frames).reshape(n_seg, seg_len, h, w, 3))
    packed_par, bg_par = pipe.process_segments(mesh, segs)
    assert packed_par.shape[:2] == (n_seg, seg_len)

    # 1% tolerance: bg mode runs the CG regionfill inside vmap, where the
    # while_loop iterates until ALL batch elements converge — elements
    # keep refining past their own tol, and the second matting pass
    # amplifies those float diffs at mask boundaries. A dropped segment
    # would mismatch ~50% of pixels.
    for s in range(n_seg):
        _, (packed_seq, bg_seq) = pipe.process_chunk(
            pipe.init_carry(), segs[s])
        assert_artifacts_close(packed_par[s], packed_seq,
                               max_bad_frac=1e-2)


def test_indivisible_segments_raise():
    frames, _ = make_clip(n=6)
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128,
                              fetch_fg="device")
    mesh = make_mesh(8)  # data=4
    segs = jnp.asarray(np.stack(frames).reshape(3, 2, h, w, 3))
    with pytest.raises(ValueError, match="not divisible"):
        pipe.process_segments(mesh, segs)


def test_model_axis_tta_matches_sequential():
    """VERDICT r4 item 6: with a DeepLab seed, `process_segments` shards
    the TTA crop batch over the MODEL axis (`_tta_scores_sharded` psum
    ensemble). The 2-axis result must match the single-device sequential
    scan (float-summation-order tolerance via assert_artifacts_close)."""
    frames, _ = make_clip(n=8)
    h, w = frames[0].shape[:2]
    cfg = dict(TEST_CFG)
    cfg["binseg"] = {"type": "deeplab",
                     "model_path": "weights/deeplab_binseg.msgpack",
                     "input_long_side": 128, "crop_h": 96, "crop_w": 96,
                     "stride_ratio": 0.5, "flip": True}
    pipe = FusedGreenPipeline(cfg, (h, w), work_long_side=128,
                              fetch_fg="device")
    mesh = make_mesh(8)  # (data=4, model=2) -> model axis active
    assert mesh.shape["model"] == 2
    segs = jnp.asarray(np.stack(frames).reshape(4, 2, h, w, 3))
    packed_par, bg_par = pipe.process_segments(mesh, segs)
    for s in range(4):
        _, (packed_seq, bg_seq) = pipe.process_chunk(
            pipe.init_carry(), segs[s])
        assert_artifacts_close(packed_par[s], packed_seq)
