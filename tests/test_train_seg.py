"""Segmenter training step on the virtual mesh + eval harness protocol."""
import os
import tempfile

import cv2
import numpy as np
import optax
import jax
import jax.numpy as jnp
import pytest

from video_unscreen_tpu.models import build_deeplab
from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.parallel.train_seg import (make_seg_batch,
                                                   make_seg_train_state,
                                                   make_seg_train_step)


def test_seg_batch_contract():
    rng = np.random.RandomState(0)
    batch = make_seg_batch(rng, 4, (64, 64))
    assert batch["img"].shape == (4, 64, 64, 3)
    assert batch["label"].shape == (4, 64, 64)
    assert set(np.unique(batch["label"])) <= {0, 1}


@pytest.mark.slow
def test_seg_train_step_reduces_loss():
    mesh = make_mesh(8)
    model = build_deeplab(num_classes=2)
    optimizer = optax.adamw(1e-3)
    state = make_seg_train_state(model, optimizer, jax.random.PRNGKey(0),
                                 sample_hw=(64, 64))
    train_step = make_seg_train_step(model, optimizer, mesh)
    rng = np.random.RandomState(0)
    batch = make_seg_batch(rng, 4, (64, 64))
    with mesh:
        state, loss0 = train_step(state, batch)
        for _ in range(4):
            state, loss = train_step(state, batch)
    assert float(loss) < float(loss0)


def test_eval_harness_protocol():
    """tools/eval.py protocol: per-video metrics + results txt artifact."""
    from video_unscreen_tpu.pipeline import run_eval

    root = tempfile.mkdtemp(prefix="vu_eval_")
    rng = np.random.RandomState(0)
    for vid in ("vidA", "vidB"):
        os.makedirs(os.path.join(root, "gt", vid))
        os.makedirs(os.path.join(root, "pred", vid))
        for i in range(3):
            gt = np.zeros((48, 64), np.uint8)
            gt[10:38, 20:50] = 255
            pred = np.roll(gt, rng.randint(0, 4), axis=0)
            cv2.imwrite(os.path.join(root, "gt", vid, f"{i:06d}.png"), gt)
            cv2.imwrite(os.path.join(root, "pred", vid,
                                     f"alphamask_{i:06d}.png"), pred)
    meta = os.path.join(root, "meta.txt")
    with open(meta, "w") as f:
        f.write("vidA\nvidB\n")
    cfg = {"data": {
        "meta_fn": meta,
        "gt_data_dir": os.path.join(root, "gt"),
        "gt_data_tmpl": "*.png",
        "pred_data_dir": os.path.join(root, "pred"),
        "pred_data_tmpl": "alphamask_*.png",
        "save_data_fn": os.path.join(root, "results", "exp.txt"),
    }}
    results = run_eval(cfg)
    assert set(results) == {"vidA", "vidB", "ALL"}
    for vid in ("vidA", "vidB", "ALL"):
        assert 0.5 <= results[vid]["miou"] <= 1.0
        assert results[vid]["sad"] >= 0.0
    assert os.path.exists(cfg["data"]["save_data_fn"])
