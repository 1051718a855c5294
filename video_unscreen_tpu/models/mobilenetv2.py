"""MobileNetV2 backbone with dilation (for the deeplab factory family).

TPU-native rebuild of `unscreen/binseg/deeplab/backbone/mobilenetv2.py`:
inverted-residual blocks with fixed-padding dilated depthwise convs
(`mobilenetv2.py:57-101`); the deeplab wrapper reads a low-level feature
(24 ch after the second stage) and the 320-ch high-level feature
(`deeplab/modeling.py:17-45` semantics).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (expansion t, channels c, repeats n, stride s) — the standard MNv2 table
_CFG = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        use_res = self.stride == 1 and in_ch == self.out_ch
        out = x
        if self.expand != 1:
            out = nn.Conv(hidden, (1, 1), use_bias=False,
                          dtype=self.dtype)(out)
            out = nn.BatchNorm(use_running_average=not train,
                               dtype=self.dtype)(out)
            out = nn.relu6(out)
        out = nn.Conv(hidden, (3, 3), strides=(self.stride,) * 2,
                      padding=self.dilation,
                      kernel_dilation=(self.dilation,) * 2,
                      feature_group_count=hidden, use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu6(out)
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        return x + out if use_res else out


class MobileNetV2Backbone(nn.Module):
    """Returns (low_level 24ch at 1/4, high_level 320ch at 1/output_stride)."""
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu6(x)
        current_stride = 2
        dilation = 1
        low_level = None
        for stage_idx, (t, c, n, s) in enumerate(_CFG):
            for i in range(n):
                stride = s if i == 0 else 1
                if stride > 1 and current_stride >= self.output_stride:
                    # convert stride to dilation (modeling.py:17-45)
                    dilation *= stride
                    stride = 1
                if stride > 1:
                    current_stride *= stride
                x = InvertedResidual(c, stride, t, dilation,
                                     self.dtype)(x, train)
            if stage_idx == 1:  # after the 24-ch stage: low-level feature
                low_level = x
        return low_level, x
