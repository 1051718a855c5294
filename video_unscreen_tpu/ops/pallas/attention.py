"""Flash-style masked cross-attention for the STM memory read.

The reference's Memory module materializes a (T*H/16*W/16, H/16*W/16)
score matrix in HBM (`unscreen/stm/model.py:141-148` — ~180 MB fp32 at
960p with a 10-slot bank). This kernel streams K/V tiles through VMEM
with the online-softmax (running max / running sum) recurrence held in
VMEM scratch, so HBM traffic is O(Q + K + V) instead of O(Q*K) and the
dot products hit the MXU at (128, 128)-aligned tiles.

Grid: (q_tiles, k_tiles) — the k axis iterates fastest and sequentially
on the same core (TPU grid semantics), so the scratch accumulators carry
across k tiles; the output block is written on the last k tile.

Softmax axis note: STM normalizes over the *memory* axis per query
(`F.softmax(p, dim=1)`), which is the standard attention softmax with
queries = query-frame pixels and keys = memory slots. Invalid
(unoccupied ring-buffer) slots are masked to -inf via `kv_mask`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                 acc_ref, m_ref, l_ref):
    """One (q_tile x k_tile) step of the online-softmax recurrence."""
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[:]          # (q_tile, dk)
    k = k_ref[:]          # (k_tile, dk)
    v = v_ref[:]          # (k_tile, dv)
    msk = mask_ref[:]     # (k_tile, 1)
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[1]))
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(msk[:, 0][None, :] > 0, s, _NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "k_tile", "interpret"))
def masked_memory_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            kv_mask: jax.Array, q_tile: int = 256,
                            k_tile: int = 512,
                            interpret: bool = False) -> jax.Array:
    """softmax(q k^T / sqrt(d), masked over invalid keys) @ v.

    Args:
      q: (Lq, Dk) queries.
      k: (Lk, Dk) keys.
      v: (Lk, Dv) values.
      kv_mask: (Lk,) validity (True/1 = attendable).
    Returns (Lq, Dv) float32.
    """
    lq, dk = q.shape
    lk, dv = k.shape[0], v.shape[1]
    q_tile = min(q_tile, _round_up(lq, 128))
    k_tile = min(k_tile, _round_up(lk, 128))
    lq_p = _round_up(lq, q_tile)
    lk_p = _round_up(lk, k_tile)
    q_p = jnp.pad(q.astype(jnp.float32), ((0, lq_p - lq), (0, 0)))
    k_p = jnp.pad(k.astype(jnp.float32), ((0, lk_p - lk), (0, 0)))
    v_p = jnp.pad(v.astype(jnp.float32), ((0, lk_p - lk), (0, 0)))
    m_p = jnp.pad(kv_mask.astype(jnp.float32), (0, lk_p - lk))[:, None]

    out = pl.pallas_call(
        _attn_kernel,
        grid=(lq_p // q_tile, lk_p // k_tile),
        in_specs=[
            pl.BlockSpec((q_tile, dk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, dk), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, dv), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, dv), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lq_p, dv), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q_tile, dv), jnp.float32),
            pltpu.VMEM((q_tile, 1), jnp.float32),
            pltpu.VMEM((q_tile, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q_p, k_p, v_p, m_p)
    return out[:lq]
