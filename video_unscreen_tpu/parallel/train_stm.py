"""STM mask-propagation training on synthetic frame pairs.

The reference loads stm_weights.pth (unavailable); this trains the STM's
memorize/segment pair end-to-end: given (frame1, mask1), predict mask2 on
a deformed frame2 — exactly the 2-frame contract the bg pipeline uses
(`tools/unscreen/bg.py:53`). Sharded like the other train steps.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data_synth import _random_alpha, _smooth_noise, draw_person
from .mesh import batch_sharding, param_shardings, replicate


class STMTrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jax.Array


def make_pair_batch(rng: np.random.RandomState, batch: int,
                    hw: Tuple[int, int] = (128, 128)
                    ) -> Dict[str, np.ndarray]:
    """(frame1, mask1, frame2, mask2): the subject translates/scales a
    little between frames over a shared background."""
    h, w = hw
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f1s, m1s, f2s, m2s = [], [], [], []
    for _ in range(batch):
        # background: textured multi-scale noise with a lighting gradient
        # (the bg-mode workload, same statistics as the non-green eval
        # clips), flat screen-like occasionally
        if rng.rand() < 0.25:
            bg = np.broadcast_to(
                rng.uniform(0.05, 0.95, 3).astype(np.float32),
                (h, w, 3)).copy()
        else:
            coarse = max(h // rng.choice([4, 6, 8]), 1)
            bg = (_smooth_noise(rng, h, w, scale=coarse) * 0.85
                  + _smooth_noise(rng, h, w, scale=max(h // 24, 1)) * 0.15)
            gy = np.linspace(rng.uniform(0.6, 1.0), rng.uniform(0.9, 1.3),
                             h, dtype=np.float32)[:, None, None]
            bg = (bg * gy).clip(0, 1)

        if rng.rand() < 0.6:
            # walking person: same figure at two walk phases + translation
            # (articulated limb motion, not just rigid shift)
            prng = np.random.RandomState(rng.randint(1 << 31))
            state = prng.get_state()
            p1 = rng.uniform(0, 2 * np.pi)
            person1, parts1 = draw_person(prng, h, w, phase=p1)
            prng.set_state(state)
            person2, parts2 = draw_person(prng, h, w,
                                          phase=p1 + rng.uniform(0.3, 2.0))
            # the FIFO memory bank matches the query against frames up to
            # memory_capacity*memory_step old — displacements accumulate
            # to tens of px, so pairs must cover that range
            dx = rng.randint(-20, 21)
            person2 = np.roll(person2, dx, axis=1)
            parts2 = np.roll(parts2, dx, axis=1)
            alpha1 = (parts1 > 0).astype(np.float32)
            alpha2 = (parts2 > 0).astype(np.float32)
            fg, fg2 = person1, person2
        else:
            # deformable blob pair (generic object tracking)
            if rng.rand() < 0.5:
                fg = np.broadcast_to(
                    rng.uniform(0.05, 0.95, 3).astype(np.float32),
                    (h, w, 3)).copy()
                fg += _smooth_noise(rng, h, w, 16) * rng.uniform(0.0, 0.2)
            else:
                fg = _smooth_noise(rng, h, w, scale=4)
            alpha1 = _random_alpha(rng, h, w)
            dx, dy = rng.randint(-20, 21, size=2)
            m = np.float32([[1, 0, dx], [0, 1, dy]])
            alpha2 = cv2.warpAffine(alpha1, m, (w, h))
            fg2 = cv2.warpAffine(fg, m, (w, h))

        def compose(a, f):
            img = a[..., None] * f + (1 - a[..., None]) * bg
            img += rng.randn(h, w, 3).astype(np.float32) * 0.02
            return ((img.clip(0, 1))[..., ::-1] - mean) / std

        f1s.append(compose(alpha1, fg))
        f2s.append(compose(alpha2, fg2))
        m1s.append((alpha1 > 0.5).astype(np.float32))
        m2s.append((alpha2 > 0.5).astype(np.int32))
    return {"frame1": np.stack(f1s), "mask1": np.stack(m1s),
            "frame2": np.stack(f2s), "mask2": np.stack(m2s)}


def stm_loss(params, batch_stats, model, batch):
    variables = {"params": params, "batch_stats": batch_stats}
    (k, v), up = model.apply(
        variables, batch["frame1"], batch["mask1"], 1.0 - batch["mask1"],
        True, mutable=["batch_stats"],
        method=lambda m, f, mf, mb, t: m.memorize(f, mf, mb, t))
    valid = jnp.ones((batch["frame1"].shape[0], 1), bool)
    logits, up2 = model.apply(
        {"params": params, "batch_stats": up["batch_stats"]},
        batch["frame2"], k[:, None], v[:, None], valid, True,
        mutable=["batch_stats"],
        method=lambda m, f, mk, mv, vl, t: m.segment_raw(f, mk, mv, vl, t))
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, batch["mask2"]).mean()
    return loss, up2["batch_stats"]


def make_stm_train_state(model, optimizer, rng,
                         sample_hw=(64, 64)) -> STMTrainState:
    h, w = sample_hw
    z = jnp.zeros((1, h, w, 3))
    variables = model.init(rng, z, jnp.zeros((1, 1, h // 16, w // 16, 128)),
                           jnp.zeros((1, 1, h // 16, w // 16, 512)),
                           jnp.ones((1, 1), bool))
    return STMTrainState(params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=optimizer.init(variables["params"]),
                         step=jnp.asarray(0))


def make_stm_train_step(model, optimizer, mesh):
    p_shard = lambda tree: param_shardings(tree, mesh)  # noqa: E731
    b_shard = batch_sharding(mesh)
    rep = replicate(mesh)

    def step_fn(state: STMTrainState, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            stm_loss, has_aux=True)(state.params, state.batch_stats, model,
                                    batch)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return STMTrainState(new_params, new_stats, new_opt,
                             state.step + 1), loss

    def shard_state(state):
        return STMTrainState(
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
