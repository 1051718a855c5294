"""Fused green pipeline: one compiled scan over frames, quality-checked
against GT like the modular driver."""
import numpy as np
import jax.numpy as jnp

from video_unscreen_tpu.ops import metrics as M
from video_unscreen_tpu.pipeline.fused_green import FusedGreenPipeline
from tests.test_pipeline_green import TEST_CFG, make_clip


def test_fused_green_quality():
    frames, gts = make_clip(n=6)
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128)
    alphas, fgs, bgs = pipe.run(frames, chunk_size=3)
    assert alphas.shape[0] == len(frames)
    mious = []
    for i, gt in enumerate(gts):
        gt_w = np.asarray(jnp.asarray(gt, jnp.float32))
        alpha_full = np.asarray(
            jnp.asarray(alphas[i], jnp.float32))
        # alphas are at work res; resize GT to work res for scoring
        from video_unscreen_tpu.ops.geometry import resize
        gt_small = np.asarray(resize(jnp.asarray(gt_w), alphas[i].shape))
        mious.append(float(M.miou(jnp.asarray(gt_small),
                                  jnp.asarray(alpha_full))))
    assert np.mean(mious) > 0.75, mious


def test_fused_green_neural_seg():
    """Non-tracking frames run the trained DeepLab TTA forward inside the
    scan (VERDICT round-1 item 2; reference `tools/unscreen/green.py:74-80`
    always seeds with SegAgent)."""
    frames, gts = make_clip(n=4)
    h, w = frames[0].shape[:2]
    cfg = dict(TEST_CFG)
    cfg["binseg"] = {"type": "deeplab",
                     "model_path": "weights/deeplab_binseg.msgpack",
                     "input_long_side": 128, "crop_h": 128, "crop_w": 128,
                     "stride_ratio": 0.5, "flip": True}
    pipe = FusedGreenPipeline(cfg, (h, w), work_long_side=128)
    assert pipe.seg is not None  # the neural path is actually wired
    alphas, _, _ = pipe.run(frames, chunk_size=2)
    from video_unscreen_tpu.ops.geometry import resize
    mious = []
    for i, gt in enumerate(gts):
        gt_small = np.asarray(resize(jnp.asarray(gt, jnp.float32),
                                     alphas[i].shape))
        mious.append(float(M.miou(jnp.asarray(gt_small),
                                  jnp.asarray(alphas[i], jnp.float32))))
    assert np.mean(mious) > 0.75, mious


def test_fused_green_tail_padding():
    frames, _ = make_clip(n=5)
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128)
    alphas, _, _ = pipe.run(frames, chunk_size=4)
    assert alphas.shape[0] == 5


def test_seed_segmenter_dispatch():
    """binseg.type routes the fused seed path: chroma -> None (weights-free
    prior), deeplab/default-with-weights -> SegAgent, human -> SCHP."""
    from video_unscreen_tpu.pipeline.fused_green import _build_seed_segmenter
    from video_unscreen_tpu.agents.binseg import HumanSegAgent, SegAgent
    assert _build_seed_segmenter({"type": "chroma"}, jnp.float32) is None
    assert _build_seed_segmenter({}, jnp.float32) is None  # no weights
    seg = _build_seed_segmenter(
        {"input_long_side": 64, "crop_h": 64, "crop_w": 64,
         "type": "deeplab"}, jnp.float32)
    assert isinstance(seg, SegAgent)
    hum = _build_seed_segmenter({"type": "human", "layers": (1, 1, 1, 1)},
                                jnp.float32)
    assert isinstance(hum, HumanSegAgent)


def test_segment_batched_matches_sequential():
    """`run_segmented` (single-chip S-way batching, VERDICT round-1 item 3)
    advances independent segments in lockstep; segment 0 must follow the
    exact carry evolution of the sequential path."""
    frames, _ = make_clip(n=6)
    h, w = frames[0].shape[:2]
    pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128)
    a_seq, _, _ = pipe.run(frames, chunk_size=3)
    a_seg, fgs, bgs = pipe.run_segmented(frames, n_segments=2,
                                         chunk_size=3)
    assert a_seg.shape == a_seq.shape
    assert fgs.shape[:3] == a_seq.shape and bgs.shape[:3] == a_seq.shape
    # segment 0 == sequential frames 0..2 (same carries, same chunking);
    # batched execution reassociates float ops -> a few uint8 ulps in the
    # matting band, nothing structural
    diff = np.abs(a_seg[:3].astype(np.int16) - a_seq[:3].astype(np.int16))
    assert diff.max() <= 4, diff.max()
    assert (diff > 1).mean() < 1e-3, (diff > 1).mean()


def test_fused_green_packed_wire_bit_exact():
    """The bit-packed d2h alpha wire (VERDICT r4 item 5) must reproduce
    the unpacked host-fetch artifacts exactly — alphas bit-identical,
    fg/bg identical since they are reconstructed from the same planes.
    Also runs the segmented driver so the per-segment fallback indexing
    is covered."""
    frames, _ = make_clip(n=6)
    h, w = frames[0].shape[:2]
    outs = {}
    for pack in (False, True):
        pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128,
                                  fetch_fg="host", pack_d2h=pack)
        assert pipe.pack_d2h is pack
        outs[pack] = pipe.run(frames, chunk_size=3)
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)

    seg_outs = {}
    for pack in (False, True):
        pipe = FusedGreenPipeline(TEST_CFG, (h, w), work_long_side=128,
                                  fetch_fg="host", pack_d2h=pack)
        seg_outs[pack] = pipe.run_segmented(frames, n_segments=2,
                                            chunk_size=2)
    for a, b in zip(seg_outs[False], seg_outs[True]):
        np.testing.assert_array_equal(a, b)
