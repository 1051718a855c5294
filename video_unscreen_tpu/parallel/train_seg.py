"""Sharded training step + synthetic data for the binary segmenter.

Gives the DeepLabV3+ SegAgent real weights (the reference's
deeplab50_weights_v5.pth is unavailable): softmax cross-entropy on
synthetic person-ish composites over varied backgrounds, dp+tp sharded
like the matting step (`parallel/train.py`).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data_synth import _random_alpha, _smooth_noise
from .mesh import batch_sharding, param_shardings, replicate


class SegTrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jax.Array


def make_seg_batch(rng: np.random.RandomState, batch: int,
                   hw: Tuple[int, int] = (128, 128),
                   green_screen_prob: float = 0.5) -> Dict[str, np.ndarray]:
    """Foreground blobs over green-screen OR textured backgrounds, with
    ImageNet-normalized RGB inputs and {0,1} labels."""
    h, w = hw
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    imgs, labels = [], []
    for _ in range(batch):
        # The scene can be LARGER than the train size: a window crop of it
        # then matches the SegAgent's sliding-window TTA views exactly
        # (`binseg/agent.py:102-141` in the reference) — crops see the
        # subject zoomed-in, partially, or not at all.
        zoom = rng.uniform(1.0, 2.5)
        sh, sw = int(h * zoom), int(w * zoom)
        if rng.rand() < green_screen_prob:
            bg = np.zeros((sh, sw, 3), np.float32)
            # BGR greenish screen with brightness variation
            bg[...] = (rng.uniform(0.05, 0.35), rng.uniform(0.5, 0.9),
                       rng.uniform(0.1, 0.4))
            bg += _smooth_noise(rng, sh, sw, 16) * 0.1
        else:
            bg = _smooth_noise(rng, sh, sw)
        # vertical lighting gradient on EVERY background — real footage
        # (and the eval clips) is gradient-lit; without this, empty
        # gradient-lit green crops are OOD and the net hallucinates
        # foreground on them (round-2 grid-TTA failure: 0.23-0.30
        # phantom fg on gt-empty crops)
        gy = np.linspace(rng.uniform(0.7, 1.0), rng.uniform(0.9, 1.25),
                         sh, dtype=np.float32)[:, None, None]
        bg = (bg * gy).clip(0, 1)
        kind = rng.rand()
        if kind < 0.12:
            # EMPTY scene — no subject at all. Anchors the calibration of
            # featureless views: an all-background window must predict
            # background (without these, continued training repeatedly
            # drifted into 'uniform green = person', the v5/v7/v8
            # collapse on empty grid crops)
            fg = bg
            alpha = np.zeros((sh, sw), np.float32)
        elif kind < 0.55:
            # articulated person figure (the eval-set foreground); half
            # soft-rendered (supersampled hair wisps / soft limb edges —
            # zoomed TTA crops see these boundaries at 2x+, where hard
            # cartoon edges are OOD)
            if rng.rand() < 0.5:
                from .data_synth import render_soft_person
                # ss=4 half the time: zoomed grid views inspect the
                # boundary at ~2x, where an ss=2 render's edges are
                # visibly coarser than the eval clips' ss=4
                fg, alpha = render_soft_person(rng, sh, sw,
                                               ss=int(rng.choice([2, 4])))
            else:
                from .data_synth import draw_person
                fg, parts = draw_person(rng, sh, sw)
                alpha = (parts > 0).astype(np.float32)
        elif kind < 0.78:
            # flat/near-flat subject color (clothing, skin-like regions),
            # kept chroma-separated from the background mean so a flat
            # subject interior is never pixel-identical to the screen
            bg_mean = bg.reshape(-1, 3).mean(0)
            for _ in range(8):
                color = rng.uniform(0.05, 0.95, 3).astype(np.float32)
                if np.abs(color - bg_mean).sum() > 0.45:
                    break
            fg = np.broadcast_to(color, (sh, sw, 3)).copy()
            fg += _smooth_noise(rng, sh, sw, 16) * rng.uniform(0.0, 0.2)
            alpha = _random_alpha(rng, sh, sw)
        else:
            fg = _smooth_noise(rng, sh, sw, scale=4)
            alpha = _random_alpha(rng, sh, sw)
        img = alpha[..., None] * fg + (1 - alpha[..., None]) * bg
        img += rng.randn(sh, sw, 3).astype(np.float32) * 0.02
        img = img.clip(0, 1)
        if rng.rand() < 0.35:
            # whole-image view
            img = cv2.resize(img, (w, h))
            alpha = cv2.resize(alpha, (w, h))
        else:
            # grid view: optionally reflect-pad bottom/right first, as
            # `pad_resize` does before the grid is cut — border crops at
            # inference contain mirrored subject parts the net must
            # label consistently (round-1/2 failure mode: phantom
            # person detections in the padded band)
            if rng.rand() < 0.5:
                py, px = rng.randint(0, h // 2), rng.randint(0, w // 2)
                img = cv2.copyMakeBorder(img, 0, py, 0, px,
                                         cv2.BORDER_REFLECT)
                alpha = cv2.copyMakeBorder(alpha, 0, py, 0, px,
                                           cv2.BORDER_REFLECT)
            # resample windows that sit ~entirely inside the subject: a
            # boundary-free flat-color view is indistinguishable from an
            # empty green screen, and labeling it "person" teaches the
            # net that featureless windows are foreground (the v5
            # regression: pure-green crops predicted 80% person)
            for _ in range(6):
                y0 = rng.randint(0, img.shape[0] - h + 1)
                x0 = rng.randint(0, img.shape[1] - w + 1)
                if (alpha[y0:y0 + h, x0:x0 + w] > 0.5).mean() < 0.85:
                    break
            img = img[y0:y0 + h, x0:x0 + w]
            alpha = alpha[y0:y0 + h, x0:x0 + w]
        if rng.rand() < 0.5:
            # horizontal flip augmentation: the TTA ensemble averages
            # flipped views, and un-augmented weights predicted the SAME
            # crop very differently flipped vs not (fgIoU 0.55 vs 0.70)
            # — that disagreement flattens the averaged boundary
            img = img[:, ::-1]
            alpha = alpha[:, ::-1]
        rgb = (img[..., ::-1] - mean) / std
        imgs.append(rgb)
        labels.append((alpha > 0.5).astype(np.int32))
    return {"img": np.stack(imgs), "label": np.stack(labels)}


def seg_loss(params, batch_stats, model, batch, dropout_rng):
    logits, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["img"], train=True, mutable=["batch_stats"],
        rngs={"dropout": dropout_rng})
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, batch["label"])
    wgt = batch.get("weight")
    if wgt is None:
        loss = ce.mean()
    else:
        loss = (ce * wgt).sum() / wgt.sum()
    return loss, updates["batch_stats"]


def make_seg_train_state(model, optimizer, rng,
                         sample_hw=(128, 128)) -> SegTrainState:
    variables = model.init(rng, jnp.zeros((1,) + tuple(sample_hw) + (3,)))
    return SegTrainState(params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=optimizer.init(variables["params"]),
                         step=jnp.asarray(0))


def make_seg_train_step(model, optimizer, mesh):
    p_shard = lambda tree: param_shardings(tree, mesh)  # noqa: E731
    b_shard = batch_sharding(mesh)
    rep = replicate(mesh)

    def step_fn(state: SegTrainState, batch):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        (loss, new_stats), grads = jax.value_and_grad(
            seg_loss, has_aux=True)(state.params, state.batch_stats, model,
                                    batch, dropout_rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return SegTrainState(new_params, new_stats, new_opt,
                             state.step + 1), loss

    def shard_state(state):
        return SegTrainState(
            params=p_shard(state.params),
            batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
            opt_state=jax.tree.map(lambda _: rep, state.opt_state),
            step=rep)

    compiled = None

    def train_step(state, batch):
        nonlocal compiled
        if compiled is None:
            compiled = jax.jit(
                step_fn,
                in_shardings=(shard_state(state),
                              {k: b_shard for k in batch}),
                out_shardings=(shard_state(state), rep))
        return compiled(state, batch)

    return train_step
