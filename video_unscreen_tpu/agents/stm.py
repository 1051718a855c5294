"""STMAgent — mask propagation across frames via Space-Time Memory.

TPU-native rebuild of `unscreen/stm/agent.py`. The host loop of alternating
memorize/segment calls with per-call `.cuda()/.cpu()` round-trips
(`stm/agent.py:131-168`) becomes a single `lax.scan` over the frame axis
with the memory bank as a **fixed-capacity ring buffer carry** — frames,
bank, and predictions stay device-resident for the whole clip.

Memory semantics: the bank holds up to `memory_capacity` committed frame
memories (FIFO eviction) and every `memory_step`-th frame commits; the
current segment always additionally sees the previous frame's memory.
NOTE an intentional deviation: the reference's bank update at
`stm/agent.py:167` parses as `t - (1 % step) == 0` and therefore only ever
commits frame 0; for the in-repo bg pipeline (which always passes exactly
2 frames, `tools/unscreen/bg.py:53`) both semantics are identical, and for
longer clips ours is the documented design.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import STM
from ..ops.geometry import (get_target_size, imnormalize, inv_pad_resize,
                            pad_resize)
from ..utils.checkpoint import load_variables


class STMAgent:
    """Same surface as `unscreen/stm/agent.py:20-221`."""

    DIVISION = 16

    def __init__(self, model_path: Optional[str] = None,
                 input_long_side: int = 960, memory_step: int = 2,
                 memory_capacity: int = 10, cuda_device: int = 0,
                 dtype=jnp.float32, seed: int = 0,
                 pallas_attention=None):
        """`pallas_attention`: None = auto (flash kernel on TPU, einsum
        elsewhere); False forces the einsum memory read — required when
        the model runs inside another program's `lax.cond` branch (XLA's
        scoped-VMEM accounting rejects the custom call there, see
        `pipeline/fused_bg.py`)."""
        self.model = STM(dtype=dtype, pallas_attention=pallas_attention)
        self.input_long_side = int(input_long_side)
        self.memory_step = int(memory_step)
        self.memory_capacity = int(memory_capacity)
        z = jnp.zeros((1, 64, 64, 3), dtype)
        self.variables = self.model.init(
            jax.random.PRNGKey(seed), z,
            jnp.zeros((1, 1, 4, 4, 128), dtype),
            jnp.zeros((1, 1, 4, 4, 512), dtype),
            jnp.asarray([[True]]))
        if model_path:
            self.variables = load_variables(model_path, self.variables)

    @functools.partial(jax.jit, static_argnums=(0,))
    def device_inference(self, variables, frames: jax.Array,
                         mask0: jax.Array) -> jax.Array:
        """frames (N, H, W, 3) normalized, H, W divisible by 16;
        mask0 (H, W) in [0, 1]. Returns (N, H, W, 2) softmax scores."""
        n, h, w, _ = frames.shape
        hm, wm = h // 16, w // 16
        cap = self.memory_capacity

        bank_k = jnp.zeros((1, cap, hm, wm, 128), frames.dtype)
        bank_v = jnp.zeros((1, cap, hm, wm, 512), frames.dtype)
        bank_n = jnp.asarray(0)
        pred0 = jnp.stack([1.0 - mask0, mask0], axis=-1)  # (H, W, 2)

        def memorize(frame, pred):
            return self.model.apply(
                variables, frame[None], pred[None, :, :, 1],
                pred[None, :, :, 0],
                method=lambda m, f, mf, mb: m.memorize(f, mf, mb))

        def step(carry, xs):
            bank_k, bank_v, bank_n, pred_prev, t = carry
            frame_prev, frame_cur = xs
            k, v = memorize(frame_prev, pred_prev)  # (1, hm, wm, C)

            # effective memory = committed bank slots + prev-frame memory
            eff_k = jnp.concatenate([bank_k, k[:, None]], axis=1)
            eff_v = jnp.concatenate([bank_v, v[:, None]], axis=1)
            slot_ids = jnp.arange(cap + 1)[None, :]
            valid = (slot_ids < bank_n) | (slot_ids == cap)

            logits = self.model.apply(
                variables, frame_cur[None], eff_k, eff_v, valid,
                method=lambda m, f, mk, mv, vl: m.segment(f, mk, mv, vl))
            pred = jax.nn.softmax(logits[0], axis=-1)

            # FIFO commit every memory_step frames
            commit = (t - 1) % self.memory_step == 0
            full = bank_n >= cap
            rolled_k = jnp.where(full, jnp.roll(bank_k, -1, axis=1), bank_k)
            rolled_v = jnp.where(full, jnp.roll(bank_v, -1, axis=1), bank_v)
            idx = jnp.minimum(bank_n, cap - 1)
            new_k = jax.lax.dynamic_update_slice_in_dim(
                rolled_k, k[:, None], idx, axis=1)
            new_v = jax.lax.dynamic_update_slice_in_dim(
                rolled_v, v[:, None], idx, axis=1)
            bank_k = jnp.where(commit, new_k, bank_k)
            bank_v = jnp.where(commit, new_v, bank_v)
            bank_n = jnp.where(commit, jnp.minimum(bank_n + 1, cap), bank_n)
            return (bank_k, bank_v, bank_n, pred, t + 1), pred

        init = (bank_k, bank_v, bank_n, pred0, jnp.asarray(1))
        _, preds = jax.lax.scan(step, init, (frames[:-1], frames[1:]))
        return jnp.concatenate([pred0[None], preds], axis=0)

    def forward(self, framelist: List[np.ndarray],
                mask0: np.ndarray) -> List[np.ndarray]:
        """Frames (BGR uint8) + first-frame mask -> per-frame masks
        (`stm/agent.py:203-221`)."""
        ori_hw = framelist[0].shape[:2]
        input_hw = get_target_size(*ori_hw, self.input_long_side,
                                   self.DIVISION)
        frames = jnp.stack([
            imnormalize(pad_resize(jnp.asarray(f, jnp.float32), input_hw))
            for f in framelist])
        m0 = pad_resize(jnp.asarray(mask0, jnp.float32), input_hw,
                        method="nearest") / 255.0
        preds = self.device_inference(self.variables, frames, m0)
        out = []
        for i in range(preds.shape[0]):
            score = inv_pad_resize(preds[i], ori_hw)
            out.append((np.asarray(jnp.argmax(score, axis=-1)) * 255
                        ).astype(np.uint8))
        return out
