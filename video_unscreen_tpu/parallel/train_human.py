"""Sharded training for the SCHP human parser.

The reference ships pretrained LIP weights (`configs/bg.json:11`,
`unscreen/binseg/agent_human.py:128-148`) that are unavailable here, so
the parser is trained from scratch on synthetic articulated-person
composites over textured (non-green) backgrounds — the bg-mode workload.
Supervision is 20-class softmax CE on the fusion logits at their native
1/4 resolution (`models/human_parse.py` returns input/4 logits; the agent
upsamples at inference, `unscreen/binseg/agent_human.py:300-305`).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data_synth import _smooth_noise, draw_person
from .mesh import batch_sharding, param_shardings, replicate
from .train_seg import SegTrainState


def make_human_batch(rng: np.random.RandomState, batch: int,
                     hw: Tuple[int, int] = (224, 224),
                     label_stride: int = 4,
                     raw_uint8: bool = False) -> Dict[str, np.ndarray]:
    """Person composites + LIP part labels at logits (1/4) resolution.

    `raw_uint8` ships BGR uint8 images (4x less host->HBM traffic on
    tunneled TPU hosts); normalization then happens on device in
    `human_loss`."""
    h, w = hw
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    imgs, labels = [], []
    for _ in range(batch):
        # The HumanSegAgent warps arbitrary-aspect frames into its square
        # input by aspect-preserving fit, zero-filled (black) outside the
        # frame (`agents/binseg.py:_transforms` + affine_warp zero fill).
        # Training must see the SAME geometry: generate the scene at a
        # random aspect ratio, then letterbox it into the square canvas.
        aspect = rng.uniform(0.45, 2.2) if rng.rand() < 0.7 else 1.0
        if aspect >= 1.0:  # portrait: height fills, width bands
            sh, sw = h, max(int(w / aspect), 16)
        else:              # landscape: width fills, height bands
            sh, sw = max(int(h * aspect), 16), w
        if rng.rand() < 0.15:  # occasional green screen (bg.json clips
            bg = np.zeros((sh, sw, 3), np.float32)  # can be green too)
            bg[...] = (rng.uniform(0.05, 0.35), rng.uniform(0.5, 0.9),
                       rng.uniform(0.1, 0.4))
            bg += _smooth_noise(rng, sh, sw, 16) * 0.1
        else:
            coarse = max(sh // rng.choice([4, 6, 8]), 1)
            bg = (_smooth_noise(rng, sh, sw, scale=coarse) * 0.85
                  + _smooth_noise(rng, sh, sw, scale=max(sh // 24, 1)) * 0.15)
            # lighting gradient (the eval clips are gradient-lit)
            gy = np.linspace(rng.uniform(0.6, 1.0), rng.uniform(0.9, 1.3),
                             sh, dtype=np.float32)[:, None, None]
            bg = bg * gy
        person, parts = draw_person(rng, sh, sw)
        alpha = (parts > 0).astype(np.float32)
        img = alpha[..., None] * person + (1 - alpha[..., None]) * bg
        # distractor blob painted but labeled background — the parser must
        # reject non-person shapes, not just detect "different from bg"
        if rng.rand() < 0.3:
            blob = np.zeros((sh, sw), np.uint8)
            cv2.ellipse(blob, (rng.randint(0, sw), rng.randint(0, sh)),
                        (rng.randint(4, sw // 4), rng.randint(4, sh // 4)),
                        rng.randint(0, 180), 0, 360, 1, -1)
            blob = (blob > 0) & (parts == 0)
            img[blob] = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        img += rng.randn(sh, sw, 3).astype(np.float32) * 0.02
        img = img.clip(0, 1)
        # zoom-crop: vary the person's pixel density (limb thickness in
        # px spans a wide range at inference)
        if rng.rand() < 0.3:
            s = rng.uniform(0.4, 0.9)
            ch, cw = max(int(sh * s), 16), max(int(sw * s), 16)
            y0 = rng.randint(0, sh - ch + 1)
            x0 = rng.randint(0, sw - cw + 1)
            img = cv2.resize(img[y0:y0 + ch, x0:x0 + cw], (sw, sh))
            parts = cv2.resize(parts.astype(np.int32)[y0:y0 + ch,
                                                      x0:x0 + cw], (sw, sh),
                               interpolation=cv2.INTER_NEAREST)
        if (sh, sw) != (h, w):
            # centered letterbox fit, zero (black) bands — exactly what
            # the agent's affine warp produces for this aspect
            canvas = np.zeros((h, w, 3), np.float32)
            pcanvas = np.zeros((h, w), np.int32)
            y0, x0 = (h - sh) // 2, (w - sw) // 2
            canvas[y0:y0 + sh, x0:x0 + sw] = img
            pcanvas[y0:y0 + sh, x0:x0 + sw] = parts
            img, parts = canvas, pcanvas
        if raw_uint8:
            imgs.append((img * 255).astype(np.uint8))
        else:
            imgs.append((img[..., ::-1] - mean) / std)
        lab = cv2.resize(parts.astype(np.int32),
                         (w // label_stride, h // label_stride),
                         interpolation=cv2.INTER_NEAREST)
        labels.append(lab)
    return {"img": np.stack(imgs), "label": np.stack(labels)}


def human_loss(params, batch_stats, model, batch, dropout_rng,
               fg_weight: float = 3.0):
    """CE on the 1/4-res fusion logits, person classes upweighted
    (background dominates ~90% of pixels)."""
    img = batch["img"]
    if img.dtype == jnp.uint8:  # BGR uint8 on the wire -> normalize here
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        img = (img[..., ::-1].astype(jnp.float32) / 255.0 - mean) / std
    logits, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        img, train=True, mutable=["batch_stats"],
        rngs={"dropout": dropout_rng})
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), batch["label"])
    wgt = jnp.where(batch["label"] > 0, fg_weight, 1.0)
    loss = (ce * wgt).sum() / wgt.sum()
    return loss, updates["batch_stats"]


def make_human_train_state(model, optimizer, rng,
                           sample_hw=(224, 224)) -> SegTrainState:
    variables = model.init(rng, jnp.zeros((1,) + tuple(sample_hw) + (3,)))
    return SegTrainState(params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=optimizer.init(variables["params"]),
                         step=jnp.asarray(0))


def make_human_train_step(model, optimizer, mesh):
    p_shard = lambda tree: param_shardings(tree, mesh)  # noqa: E731
    b_shard = batch_sharding(mesh)
    rep = replicate(mesh)

    def step_fn(state: SegTrainState, batch):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(23), state.step)
        (loss, new_stats), grads = jax.value_and_grad(
            human_loss, has_aux=True)(state.params, state.batch_stats,
                                      model, batch, dropout_rng)
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

    compiled = {}

    def train_step(state, batch):
        key = batch["img"].shape
        if key not in compiled:
            compiled[key] = jax.jit(
                step_fn,
                in_shardings=(shard_state(state),
                              {k: b_shard for k in batch}),
                out_shardings=(shard_state(state), rep))
        return compiled[key](state, batch)

    return train_step
