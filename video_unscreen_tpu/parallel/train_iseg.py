"""Interactive-segmentation (DistMaps) training on synthetic clicks.

The reference's iseg weights are unavailable; this trains the
DistMapsModel with clicks sampled from GT masks: 1-3 positives inside
the subject, 0-2 negatives outside, sigmoid BCE against the mask —
the standard click-supervision recipe for `agents/iseg.py`.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data_synth import _random_alpha, _smooth_noise
from .mesh import batch_sharding, param_shardings, replicate


class ISegTrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jax.Array


def _sample_point(rng, mask_bool):
    ys, xs = np.where(mask_bool)
    if len(ys) == 0:
        return None
    i = rng.randint(len(ys))
    return ys[i], xs[i]


def make_click_batch(rng: np.random.RandomState, batch: int,
                     hw: Tuple[int, int] = (128, 128),
                     max_clicks: int = 20) -> Dict[str, np.ndarray]:
    h, w = hw
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    imgs, points, labels = [], [], []
    for _ in range(batch):
        if rng.rand() < 0.4:
            # flat screen-like background — flat color must not be a
            # foreground-only cue
            bg = np.broadcast_to(
                rng.uniform(0.05, 0.95, 3).astype(np.float32),
                (h, w, 3)).copy()
            bg += _smooth_noise(rng, h, w, 16) * rng.uniform(0.0, 0.1)
        else:
            bg = _smooth_noise(rng, h, w)
        if rng.rand() < 0.5:
            fg = np.broadcast_to(
                rng.uniform(0.05, 0.95, 3).astype(np.float32),
                (h, w, 3)).copy()
        else:
            fg = _smooth_noise(rng, h, w, scale=4)
        alpha = _random_alpha(rng, h, w)
        img = alpha[..., None] * fg + (1 - alpha[..., None]) * bg
        img += rng.randn(h, w, 3).astype(np.float32) * 0.02
        label = (alpha > 0.5).astype(np.int32)

        pts = np.full((max_clicks, 3), -1.0, np.float32)
        idx = 0
        for _ in range(rng.randint(1, 4)):  # positives
            p = _sample_point(rng, label > 0)
            if p is not None:
                pts[idx] = (1.0, p[0], p[1])
                idx += 1
        for _ in range(rng.randint(0, 3)):  # negatives
            p = _sample_point(rng, label == 0)
            if p is not None:
                pts[idx] = (0.0, p[0], p[1])
                idx += 1
        imgs.append((img.clip(0, 1)[..., ::-1] - mean) / std)
        points.append(pts)
        labels.append(label)
    return {"img": np.stack(imgs), "points": np.stack(points),
            "label": np.stack(labels)}


def iseg_loss(params, batch_stats, model, batch, dropout_rng):
    logits, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["img"], batch["points"], train=True,
        mutable=["batch_stats"], rngs={"dropout": dropout_rng})
    loss = optax.sigmoid_binary_cross_entropy(
        logits[..., 0], batch["label"].astype(jnp.float32)).mean()
    return loss, updates["batch_stats"]


def make_iseg_train_state(model, optimizer, rng, sample_hw=(128, 128),
                          max_clicks: int = 20) -> ISegTrainState:
    h, w = sample_hw
    variables = model.init(rng, jnp.zeros((1, h, w, 3)),
                           jnp.full((1, max_clicks, 3), -1.0))
    return ISegTrainState(params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=optimizer.init(variables["params"]),
                          step=jnp.asarray(0))


def make_iseg_train_step(model, optimizer, mesh):
    p_shard = lambda tree: param_shardings(tree, mesh)  # noqa: E731
    b_shard = batch_sharding(mesh)
    rep = replicate(mesh)

    def step_fn(state: ISegTrainState, batch):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(23), state.step)
        (loss, new_stats), grads = jax.value_and_grad(
            iseg_loss, has_aux=True)(state.params, state.batch_stats,
                                     model, batch, dropout_rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return ISegTrainState(new_params, new_stats, new_opt,
                              state.step + 1), loss

    def shard_state(state):
        return ISegTrainState(
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
