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


def make_clip_batch(rng: np.random.RandomState, batch: int,
                    hw: Tuple[int, int] = (128, 128),
                    clip_len: int = 3) -> Dict[str, np.ndarray]:
    """T-frame clips: frames 0..T-2 become memory entries (teacher-forced
    with their GT masks), frame T-1 is the query. Training with T > 2
    memories is what makes the FIFO ring bank work at inference — a net
    trained on single-memory pairs smears attention across a multi-slot
    bank (long-drift clip MIOU 0.36 with 10 memories vs 0.9+ with one).

    Returns {"frames": (B, T, h, w, 3) normalized, "masks": (B, T, h, w)}.
    """
    h, w = hw
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    all_frames, all_masks = [], []
    for _ in range(batch):
        # background: textured multi-scale noise with a lighting gradient
        # (the bg-mode workload, same statistics as the non-green eval
        # clips), flat screen-like occasionally, or pure single-octave
        # smooth noise (no fine detail, no gradient — featureless smooth
        # regions locally resemble a flat-color subject; without this
        # class the memory read spills fg onto them, the round-2
        # long-clip gate failure: 28% predicted fg vs 13% GT at frame 1)
        r_bg = rng.rand()
        if r_bg < 0.2:
            bg = np.broadcast_to(
                rng.uniform(0.05, 0.95, 3).astype(np.float32),
                (h, w, 3)).copy()
        elif r_bg < 0.45:
            bg = _smooth_noise(rng, h, w,
                               scale=max(h // rng.choice([6, 8, 12]), 1))
        else:
            coarse = max(h // rng.choice([4, 6, 8]), 1)
            bg = (_smooth_noise(rng, h, w, scale=coarse) * 0.85
                  + _smooth_noise(rng, h, w, scale=max(h // 24, 1)) * 0.15)
            gy = np.linspace(rng.uniform(0.6, 1.0), rng.uniform(0.9, 1.3),
                             h, dtype=np.float32)[:, None, None]
            bg = (bg * gy).clip(0, 1)

        fgs, alphas = [], []
        if rng.rand() < 0.6:
            # walking person: same figure at successive walk phases with
            # per-step translation (articulated motion, not rigid shift)
            prng = np.random.RandomState(rng.randint(1 << 31))
            state = prng.get_state()
            p1 = rng.uniform(0, 2 * np.pi)
            dphase = rng.uniform(0.3, 1.0)
            # displacements accumulate across the clip the way they do
            # across the FIFO bank's lifetime at inference
            step_dx = rng.randint(-10, 11)
            for t in range(clip_len):
                prng.set_state(state)
                person, parts = draw_person(prng, h, w,
                                            phase=p1 + t * dphase)
                person = np.roll(person, t * step_dx, axis=1)
                parts = np.roll(parts, t * step_dx, axis=1)
                fgs.append(person)
                alphas.append((parts > 0).astype(np.float32))
        else:
            # deformable blob clip (generic object tracking)
            if rng.rand() < 0.5:
                fg = np.broadcast_to(
                    rng.uniform(0.05, 0.95, 3).astype(np.float32),
                    (h, w, 3)).copy()
                fg += _smooth_noise(rng, h, w, 16) * rng.uniform(0.0, 0.2)
            else:
                fg = _smooth_noise(rng, h, w, scale=4)
            alpha0 = _random_alpha(rng, h, w)
            step = rng.randint(-10, 11, size=2)
            for t in range(clip_len):
                m = np.float32([[1, 0, t * step[0]], [0, 1, t * step[1]]])
                alphas.append(cv2.warpAffine(alpha0, m, (w, h)))
                fgs.append(cv2.warpAffine(fg, m, (w, h)))

        def compose(a, f):
            img = a[..., None] * f + (1 - a[..., None]) * bg
            img += rng.randn(h, w, 3).astype(np.float32) * 0.02
            return ((img.clip(0, 1))[..., ::-1] - mean) / std

        all_frames.append(np.stack([compose(a, f)
                                    for a, f in zip(alphas, fgs)]))
        all_masks.append(np.stack([(a > 0.5).astype(np.float32)
                                   for a in alphas]))
    return {"frames": np.stack(all_frames), "masks": np.stack(all_masks)}


def make_pair_batch(rng: np.random.RandomState, batch: int,
                    hw: Tuple[int, int] = (128, 128)
                    ) -> Dict[str, np.ndarray]:
    """2-frame compatibility wrapper over `make_clip_batch`."""
    b = make_clip_batch(rng, batch, hw, clip_len=2)
    return {"frame1": b["frames"][:, 0], "mask1": b["masks"][:, 0],
            "frame2": b["frames"][:, 1],
            "mask2": b["masks"][:, 1].astype(np.int32)}


def stm_loss(params, batch_stats, model, batch):
    """Memorize frames 0..T-2 (teacher-forced GT masks) into a T-1 slot
    bank, segment frame T-1 against the whole bank — the inference-time
    FIFO ring contract (`agents/stm.py`), not just a single-memory pair."""
    if "frames" in batch:
        frames, masks = batch["frames"], batch["masks"]
        T = frames.shape[1]
        mem_frames = [(frames[:, t], masks[:, t]) for t in range(T - 1)]
        query, target = frames[:, -1], batch["masks"][:, -1].astype(
            jnp.int32)
    else:  # 2-frame pair dict (compat)
        mem_frames = [(batch["frame1"], batch["mask1"])]
        query, target = batch["frame2"], batch["mask2"]
    stats = batch_stats
    ks, vs = [], []
    for f, mmask in mem_frames:
        (k, v), up = model.apply(
            {"params": params, "batch_stats": stats},
            f, mmask, 1.0 - mmask, True, mutable=["batch_stats"],
            method=lambda m, fr, mf, mb, t: m.memorize(fr, mf, mb, t))
        stats = up["batch_stats"]
        ks.append(k)
        vs.append(v)
    mem_k = jnp.stack(ks, axis=1)
    mem_v = jnp.stack(vs, axis=1)
    valid = jnp.ones((query.shape[0], len(ks)), bool)
    logits, up2 = model.apply(
        {"params": params, "batch_stats": stats},
        query, mem_k, mem_v, valid, True,
        mutable=["batch_stats"],
        method=lambda m, f, mk, mv, vl, t: m.segment_raw(f, mk, mv, vl, t))
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, target).mean()
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
