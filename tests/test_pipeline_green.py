"""End-to-end green mode on a tiny synthetic green-screen clip, scored
with the eval-harness metrics (the reference's de-facto integration test,
SURVEY.md §4)."""
import numpy as np
import pytest

from video_unscreen_tpu.ops import metrics as M
from video_unscreen_tpu.pipeline import run_green
import jax.numpy as jnp


def make_clip(n=5, h=96, w=128, seed=0):
    """Moving magenta blob over a green screen + GT alphas."""
    rng = np.random.RandomState(seed)
    frames, gts = [], []
    for t in range(n):
        img = np.zeros((h, w, 3), np.float32)
        img[...] = (40, 190, 50)
        alpha = np.zeros((h, w), np.float32)
        cx = 50 + 4 * t
        yy, xx = np.mgrid[0:h, 0:w]
        blob = ((yy - 48) ** 2 / 900 + (xx - cx) ** 2 / 400) < 1.0
        alpha[blob] = 255
        a = (alpha / 255.0)[..., None]
        img = img * (1 - a) + np.array((150, 60, 170), np.float32) * a
        img += rng.randn(h, w, 3) * 5
        frames.append(img.clip(0, 255).astype(np.uint8))
        gts.append(alpha.astype(np.uint8))
    return frames, gts


TEST_CFG = {
    "cuda_device": 0,
    "colorfiltering_update_duration": 30,
    "colorfiltering_train_iters": 2,
    "fg_exist_thr": 0.001,
    "binseg": {"type": "chroma", "input_long_side": 128},
    "colorfiltering": {
        "input_long_side": 128,
        "bg_ncomp": [3, 5, 5],
        "fg_ncomp": [10, 10, 10],
        "max_num_samples": 10000,
        "color_prior_winsize": 30,
    },
    "objectremoval": {
        "score_map_center": {"landscape": [0.5, 0.5],
                             "portrait": [0.6, 0.5]},
        "saliency_thr": 0.005,
        "consensus_thr": 0.5,
    },
    "trimap": {"input_long_side": 128, "kernelsize": 3, "iters": 3,
               "color_winsize": [10, 100, 180]},
    "vmatting": {"model_path": "weights/matting_unet.msgpack",
                 "input_long_side": 128},
    "data": {"dst_img_dir": "/tmp/unscreen_test_out", "range": None},
}


@pytest.mark.slow
def test_green_mode_end_to_end():
    frames, gts = make_clip()
    result = run_green(TEST_CFG, frames=frames, save=False)
    assert result["numframes"] == len(frames)
    # score with the eval protocol; the chroma path should track the blob
    mious = []
    for alpha, gt in zip(result["alphas"], gts):
        mious.append(float(M.miou(jnp.asarray(gt, jnp.float32),
                                  jnp.asarray(alpha, jnp.float32))))
    assert np.mean(mious) > 0.75, f"MIOUs: {mious}"
    # later frames should use tracking
    assert result["tracking_count"] >= 1
