"""STM — Space-Time Memory network for video object segmentation.

TPU-native rebuild of `unscreen/stm/model.py` (Oh et al., ICCV'19 as used
by STMAgent). Architecture: memory/query encoders on a resnet50 trunk
(through layer3, 1024 ch at 1/16), KeyValue heads 1024 -> (128, 512),
scaled-dot-product memory read over T*H/16*W/16 slots, refinement decoder
to 2-class logits at 1/4 upsampled x4, soft aggregation.

TPU-first design:
- The memory bank is a **fixed-capacity ring buffer** with a validity mask
  instead of a growing concat (`stm/agent.py:149-153` concatenates and
  FIFO-evicts on the host). Invalid slots are masked to -inf before the
  softmax, so one compiled `segment` serves any bank occupancy.
- The memory read is a single einsum pair (MXU) with the softmax over the
  key axis — shape-static, flash-style Pallas kernel ready to slot in for
  long banks.
- NHWC throughout; keys/values are (B, T, Hm, Wm, C).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNet


class ResBlock(nn.Module):
    """Pre-activation residual block (`stm/model.py:10-30`)."""
    outdim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.outdim, (3, 3), padding=1, dtype=self.dtype)(
            nn.relu(x))
        r = nn.Conv(self.outdim, (3, 3), padding=1, dtype=self.dtype)(
            nn.relu(r))
        if x.shape[-1] != self.outdim:
            x = nn.Conv(self.outdim, (3, 3), padding=1, dtype=self.dtype)(x)
        return x + r


class Refine(nn.Module):
    """Skip-refinement block (`stm/model.py:90-108`)."""
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, pm):
        s = ResBlock(self.planes, self.dtype)(
            nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype)(f))
        n, h, w, c = pm.shape
        up = jax.image.resize(pm, (n, h * 2, w * 2, c), method="linear")
        return ResBlock(self.planes, self.dtype)(s + up)


class Decoder(nn.Module):
    """Refinement decoder to 2-ch logits (`stm/model.py:111-132`)."""
    mdim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, r4, r3, r2):
        m4 = ResBlock(self.mdim, self.dtype)(
            nn.Conv(self.mdim, (3, 3), padding=1, dtype=self.dtype)(r4))
        m3 = Refine(self.mdim, self.dtype)(r3, m4)   # 1/8
        m2 = Refine(self.mdim, self.dtype)(r2, m3)   # 1/4
        p2 = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype)(nn.relu(m2))
        n, h, w, c = p2.shape
        return jax.image.resize(p2, (n, h * 4, w * 4, c), method="linear")


class KeyValue(nn.Module):
    """1024 -> (keydim, valdim) heads (`stm/model.py:159-169`)."""
    keydim: int = 128
    valdim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = nn.Conv(self.keydim, (3, 3), padding=1, dtype=self.dtype)(x)
        v = nn.Conv(self.valdim, (3, 3), padding=1, dtype=self.dtype)(x)
        return k, v


def memory_read(mem_k, mem_v, valid, q_k, q_v, use_pallas=None):
    """Masked scaled-dot-product read over the memory bank.

    Equivalent of `stm/model.py:135-156` with a fixed-capacity bank:
      mem_k: (B, T, Hm, Wm, Ck), mem_v: (B, T, Hm, Wm, Cv),
      valid: (B, T) slot validity, q_k: (B, Hm, Wm, Ck),
      q_v: (B, Hm, Wm, Cv).
    Returns (B, Hm, Wm, 2*Cv) — read result concat query value.

    On TPU the read goes through the flash-style Pallas kernel
    (`ops/pallas/attention.py`) — no (THW x HW) score matrix in HBM; on
    other backends it falls back to a fused einsum pair.
    """
    b, t, hm, wm, ck = mem_k.shape
    cv = mem_v.shape[-1]
    mk = mem_k.reshape(b, t * hm * wm, ck)
    mv = mem_v.reshape(b, t * hm * wm, cv)
    qk = q_k.reshape(b, hm * wm, ck)
    mask = jnp.repeat(valid, hm * wm, axis=1)  # (B, T*Hm*Wm)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from ..ops.pallas.attention import masked_memory_attention
        mem = jax.vmap(masked_memory_attention)(
            qk, mk, mv, mask.astype(jnp.float32))
    else:
        logits = jnp.einsum("bkc,bqc->bkq", mk, qk,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(ck))
        logits = jnp.where(mask[:, :, None], logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=1)
        mem = jnp.einsum("bkv,bkq->bqv", mv, p,
                         preferred_element_type=jnp.float32)
    mem = mem.reshape(b, hm, wm, cv)
    return jnp.concatenate([mem, q_v], axis=-1)


class STM(nn.Module):
    """Full STM net (`stm/model.py:172-225`).

    Call modes (dispatched by `method`):
      memorize(frame, mask_fg, mask_bg) -> (k4, v4) at 1/16
      segment(frame, mem_k, mem_v, valid) -> 2-ch logits at input res

    `pallas_attention`: None = auto (Pallas on TPU, einsum elsewhere).
    The kernel carries a flash-backward custom VJP
    (`ops/pallas/attention.py`), so training may also use it — at large
    memory banks it is the only path whose backward fits HBM.
    """
    dtype: Any = jnp.float32
    pallas_attention: Any = None

    def setup(self):
        trunk = dict(block="bottleneck", layers=(3, 4, 6), num_stages=3,
                     dtype=self.dtype)
        self.encoder_q = ResNet(**trunk, name="encoder_q")
        self.encoder_m = ResNet(**trunk, name="encoder_m")
        # 1-channel mask/other-mask convs summed into the stem
        # (`stm/model.py:37-40,55`)
        self.conv1_m = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                               use_bias=False, dtype=self.dtype)
        self.conv1_o = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                               use_bias=False, dtype=self.dtype)
        self.kv_m = KeyValue(dtype=self.dtype)
        self.kv_q = KeyValue(dtype=self.dtype)
        self.decoder = Decoder(dtype=self.dtype)

    def memorize(self, frame, mask_fg, mask_bg, train: bool = False):
        """frame (B,H,W,3) normalized; masks (B,H,W) in [0,1].

        The mask convs feed the stem additively, so we run the trunk on the
        summed stem activation by injecting through the shared encoder_m.
        """
        extra = (self.conv1_m(mask_fg[..., None])
                 + self.conv1_o(mask_bg[..., None]))
        feats = self._encode(self.encoder_m, frame, extra, train)
        return self.kv_m(feats["c3"])

    def segment_raw(self, frame, mem_k, mem_v, valid, train: bool = False):
        """Decoder logits before soft aggregation (the training target —
        the aggregation's clipped log-odds transform saturates grads)."""
        feats = self._encode(self.encoder_q, frame, None, train)
        r4, r3, r2 = feats["c3"], feats["c2"], feats["c1"]
        q_k, q_v = self.kv_q(r4)
        m4 = memory_read(mem_k, mem_v, valid, q_k, q_v,
                         use_pallas=self.pallas_attention)
        return self.decoder(m4, r3, r2)

    def segment(self, frame, mem_k, mem_v, valid, train: bool = False):
        logits = self.segment_raw(frame, mem_k, mem_v, valid, train)
        # soft aggregation (`stm/model.py:195-202`)
        ps = jax.nn.softmax(logits, axis=-1)[..., 1]
        em_bg = jnp.clip(1.0 - ps, 1e-7, 1 - 1e-7)
        em_fg = jnp.clip(ps, 1e-7, 1 - 1e-7)
        return jnp.stack([jnp.log(em_bg / (1.0 - em_bg)),
                          jnp.log(em_fg / (1.0 - em_fg))], axis=-1)

    def _encode(self, encoder, frame, stem_extra, train):
        """Run a trunk, optionally adding `stem_extra` to the stem conv
        output before BN (matching `stm/model.py:52-62`)."""
        return encoder(frame, train, stem_extra=stem_extra)

    def __call__(self, frame, mem_k, mem_v, valid, train: bool = False):
        """Init/inspection path: touches BOTH memorize and segment so a
        single `init` creates every parameter (memory encoder included)."""
        zero_mask = jnp.zeros(frame.shape[:3], frame.dtype)
        self.memorize(frame, zero_mask, zero_mask, train)
        return self.segment(frame, mem_k, mem_v, valid, train)
