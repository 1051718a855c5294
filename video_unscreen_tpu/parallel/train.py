"""Sharded training step for the flagship MattingUNet.

The reference ships no training code (weights are read-only inputs,
SURVEY.md §5 checkpoint/resume); this framework needs one to produce its
own weights. The step is a `jit` over a (data, model) mesh: batch sharded
on `data` (DP), large conv kernels sharded on output channels over
`model` (TP), activations spatially constrained (SP) — XLA inserts the
psum/all-gather collectives over ICI.

Loss: alpha L1 + composition L1 (Deep Image Matting-style) restricted to
the trimap's unknown band, matching how the matting net is used at
inference (prediction only counts in the unknown band,
`unscreen/vmatting/agent.py:128-131`).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import MattingUNet
from .mesh import batch_sharding, param_shardings, replicate


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def matting_loss(params, batch_stats, model, batch):
    """L1 alpha + composition loss in the unknown band."""
    img, alpha_pre, trimap, gt = (batch["img"], batch["alpha_pre"],
                                  batch["trimap"], batch["alpha_gt"])
    pred, updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        img, alpha_pre, trimap, train=True, mutable=["batch_stats"])
    pred = pred[..., 0]
    unknown = trimap[..., 1]  # one-hot channel 1 = unknown band
    denom = jnp.maximum(unknown.sum(), 1.0)
    alpha_l1 = (jnp.abs(pred - gt) * unknown).sum() / denom
    # composition: pred-alpha-blended image vs gt-alpha-blended image
    comp_err = jnp.abs((pred - gt)[..., None] * img).mean(-1)
    comp_l1 = (comp_err * unknown).sum() / denom
    return alpha_l1 + comp_l1, updates["batch_stats"]


def make_train_state(model: MattingUNet, optimizer, rng, sample_hw=(64, 64),
                     dtype=jnp.float32) -> TrainState:
    h, w = sample_hw
    z = jnp.zeros((1, h, w, 3), dtype)
    variables = model.init(rng, z, z[..., :1], z)
    params = variables["params"]
    return TrainState(params=params, batch_stats=variables["batch_stats"],
                      opt_state=optimizer.init(params),
                      step=jnp.asarray(0))


def make_train_step(model: MattingUNet, optimizer, mesh):
    """Build the pjit-ed train step with explicit in/out shardings."""
    p_shard = lambda tree: param_shardings(tree, mesh)  # noqa: E731
    b_shard = batch_sharding(mesh)
    rep = replicate(mesh)

    def step_fn(state: TrainState, batch) -> tuple:
        (loss, new_stats), grads = jax.value_and_grad(
            matting_loss, has_aux=True)(state.params, state.batch_stats,
                                        model, batch)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt,
                          state.step + 1), loss

    def shard_state(state: TrainState):
        return TrainState(
            params=p_shard(state.params),
            batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
            opt_state=jax.tree.map(lambda _: rep, state.opt_state),
            step=rep)

    def shard_batch(batch):
        return {k: b_shard for k in batch}

    compiled = None

    def train_step(state: TrainState, batch):
        nonlocal compiled
        if compiled is None:
            compiled = jax.jit(
                step_fn,
                in_shardings=(shard_state(state), shard_batch(batch)),
                out_shardings=(shard_state(state), rep))
        return compiled(state, batch)

    return train_step
