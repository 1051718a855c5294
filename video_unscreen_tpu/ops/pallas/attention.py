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


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
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
        l_fin = jnp.maximum(l_ref[:], 1e-30)
        # zero valid keys: m never left _NEG_INF, p degenerated to
        # exp(0)=1 per key — zero the output instead of emitting mean(V),
        # and set lse=0 so the backward's p=exp(s-lse)=exp(-1e30) == 0
        # (no gradient leak to masked keys)
        any_valid = m_ref[:] > _NEG_INF * 0.5
        o_ref[:] = jnp.where(any_valid, acc_ref[:] / l_fin, 0.0)
        # log-sum-exp residual for the backward pass
        lse_ref[:] = jnp.where(any_valid, m_ref[:] + jnp.log(l_fin), 0.0)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, acc_ref):
    """dQ = (P * (dO V^T - delta)) K * scale, accumulated over k tiles."""
    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    msk = mask_ref[:]
    do = do_ref[:]
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[1]))
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(msk[:, 0][None, :] > 0, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[:])                      # (q_tile, k_tile)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[:])
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[:] = acc_ref[:] * scale


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, acck_ref, accv_ref):
    """dV = P^T dO; dK = (P * (dO V^T - delta))^T Q * scale — one k tile,
    accumulated over q tiles (grid = (k_tiles, q_tiles))."""
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acck_ref[:] = jnp.zeros_like(acck_ref)
        accv_ref[:] = jnp.zeros_like(accv_ref)

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    msk = mask_ref[:]
    do = do_ref[:]
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[1]))
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(msk[:, 0][None, :] > 0, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[:])                      # (q_tile, k_tile)
    accv_ref[:] = accv_ref[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[:])
    acck_ref[:] = acck_ref[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[:] = acck_ref[:] * scale
        dv_ref[:] = accv_ref[:]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# The kernel's true VMEM need is the double-buffered blocks + scratch
# (a few MB at the default tiles). Declaring a large limit here is
# counterproductive: XLA reserves the declared bytes as scoped stack ON
# TOP of the kernel's operands/outputs, and the fused bg program OOMed
# scoped VMEM at 100MB declared (106.59M asked vs 100M cap) — so declare
# only what the tiles can actually touch.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _pad_inputs(q, k, v, kv_mask, q_tile, k_tile):
    lq, _ = q.shape
    lk = k.shape[0]
    q_tile = min(q_tile, _round_up(lq, 128))
    k_tile = min(k_tile, _round_up(lk, 128))
    lq_p = _round_up(lq, q_tile)
    lk_p = _round_up(lk, k_tile)
    q_p = jnp.pad(q.astype(jnp.float32), ((0, lq_p - lq), (0, 0)))
    k_p = jnp.pad(k.astype(jnp.float32), ((0, lk_p - lk), (0, 0)))
    v_p = jnp.pad(v.astype(jnp.float32), ((0, lk_p - lk), (0, 0)))
    m_p = jnp.pad(kv_mask.astype(jnp.float32), (0, lk_p - lk))[:, None]
    return q_p, k_p, v_p, m_p, q_tile, k_tile


def _fwd_call(q_p, k_p, v_p, m_p, q_tile, k_tile, interpret):
    (lq_p, dk), dv = q_p.shape, v_p.shape[1]
    lk_p = k_p.shape[0]
    return pl.pallas_call(
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
        out_specs=(pl.BlockSpec((q_tile, dv), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((lq_p, dv), jnp.float32),
                   jax.ShapeDtypeStruct((lq_p, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((q_tile, dv), jnp.float32),
            pltpu.VMEM((q_tile, 1), jnp.float32),
            pltpu.VMEM((q_tile, 1), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(q_p, k_p, v_p, m_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mma(q, k, v, kv_mask, q_tile, k_tile, interpret):
    out, _ = _mma_fwd(q, k, v, kv_mask, q_tile, k_tile, interpret)
    return out


def _mma_fwd(q, k, v, kv_mask, q_tile, k_tile, interpret):
    lq = q.shape[0]
    q_p, k_p, v_p, m_p, qt, kt = _pad_inputs(q, k, v, kv_mask,
                                             q_tile, k_tile)
    out_p, lse_p = _fwd_call(q_p, k_p, v_p, m_p, qt, kt, interpret)
    return out_p[:lq], (q_p, k_p, v_p, m_p, out_p, lse_p, kv_mask)


def _mma_bwd(q_tile, k_tile, interpret, res, g):
    """Flash backward: recompute P tile-wise from the saved log-sum-exp;
    dV = P^T dO, dS = P*(dO V^T - rowsum(dO*O)), dQ = dS K, dK = dS^T Q.
    Padded q rows contribute nothing (dO there is zero-padded); padded /
    invalid k rows are masked to P=0."""
    q_p, k_p, v_p, m_p, out_p, lse_p, kv_mask = res
    (lq_p, dk), dv = q_p.shape, v_p.shape[1]
    lk_p = k_p.shape[0]
    lq = g.shape[0]
    # tile sizes were clamped the same way in the forward
    q_tile = min(q_tile, _round_up(lq, 128))
    k_tile = min(k_tile, _round_up(kv_mask.shape[0], 128))
    do_p = jnp.pad(g.astype(jnp.float32), ((0, lq_p - lq), (0, 0)))
    delta_p = jnp.sum(do_p * out_p, axis=1, keepdims=True)

    dq_p = pl.pallas_call(
        _bwd_dq_kernel,
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
            pl.BlockSpec((q_tile, dv), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, dk), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lq_p, dk), jnp.float32),
        scratch_shapes=[pltpu.VMEM((q_tile, dk), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(q_p, k_p, v_p, m_p, do_p, lse_p, delta_p)

    dk_p, dv_p = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(lk_p // k_tile, lq_p // q_tile),
        in_specs=[
            pl.BlockSpec((q_tile, dk), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, dk), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, dv), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, dv), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((k_tile, dk), lambda j, i: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((k_tile, dv), lambda j, i: (j, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((lk_p, dk), jnp.float32),
                   jax.ShapeDtypeStruct((lk_p, dv), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((k_tile, dk), jnp.float32),
                        pltpu.VMEM((k_tile, dv), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(q_p, k_p, v_p, m_p, do_p, lse_p, delta_p)

    lk = kv_mask.shape[0]
    return (dq_p[:lq], dk_p[:lk], dv_p[:lk], jnp.zeros_like(kv_mask))


_mma.defvjp(_mma_fwd, _mma_bwd)


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "k_tile", "interpret"))
def masked_memory_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            kv_mask: jax.Array, q_tile: int = 128,
                            k_tile: int = 256,
                            interpret: bool = False) -> jax.Array:
    """softmax(q k^T / sqrt(d), masked over invalid keys) @ v.

    Differentiable: a custom VJP runs the flash backward (tile-wise P
    recomputation from the saved log-sum-exp) in Pallas, so STM training
    can use the kernel at memory-bank sizes whose dense score matrix
    would not fit HBM. With zero valid keys the output is 0 and no
    gradient flows to any key (the STM ring buffer always has >= 1 valid
    slot, but the kernel no longer silently returns mean(V) if misused).

    Args:
      q: (Lq, Dk) queries.
      k: (Lk, Dk) keys.
      v: (Lk, Dv) values.
      kv_mask: (Lk,) validity (True/1 = attendable).
    Returns (Lq, Dv) float32.
    """
    # float mask into the custom_vjp so its (zero) cotangent is well-typed
    return _mma(q, k, v, kv_mask.astype(jnp.float32), q_tile, k_tile,
                interpret)
