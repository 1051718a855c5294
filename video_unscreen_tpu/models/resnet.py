"""ResNet backbone family — one configurable trunk for four model families.

The reference carries three separate ResNet copies (torchvision-style for
DeepLab, `unscreen/binseg/deeplab/backbone/resnet.py`; deep-stem dilated
ResNet-101 for SCHP, `unscreen/binseg/human_parse.py:159-245`; gluon
ResNetV1b/V1s for BRS, `unscreen/iseg/brs/models/resnetv1b.py`; and
torchvision resnet50 inside STM). TPU-native design: one flax trunk,
NHWC, parameterized by block type, stem style, and per-stage dilation
(`replace_stride_with_dilation`), returning the intermediate feature
pyramid that each head needs — so all four families share compiled
building blocks.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=self.dilation,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        if self.use_projection:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=self.dilation,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        if self.use_projection:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Configurable trunk.

    Args:
      block: "basic" | "bottleneck".
      layers: blocks per stage, e.g. (3, 4, 6, 3) for resnet50.
      stem: "basic" (7x7 s2 conv) or "deep" (three 3x3 convs — the SCHP /
        gluon-V1s stem, `human_parse.py:203-215`, `resnetv1b.py:350-393`).
      replace_stride_with_dilation: per-stage-2..4 flags; a True stage keeps
        stride 1 and doubles the dilation (torchvision semantics used by
        `deeplab/backbone/resnet.py`).
      in_conv_extra: extra input channels are handled by the caller.
    Returns a dict of features: stem, c1 (after stage1) .. c4 (after stage4).
    """
    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    stem: str = "basic"
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    width: int = 64
    num_stages: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 stem_extra=None) -> Dict[str, jnp.ndarray]:
        """`stem_extra`, if given, is added to the first stem conv output
        before BN (the STM memory encoder injects 1-channel mask features
        this way, `unscreen/stm/model.py:52-62`; basic stem only)."""
        dt = self.dtype
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4

        if self.stem == "deep":
            for i, (ch, s) in enumerate(((self.width, 2), (self.width, 1),
                                         (self.width * 2, 1))):
                x = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                            use_bias=False, dtype=dt,
                            name=f"stem_conv{i + 1}")(x)
                x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                                 name=f"stem_bn{i + 1}")(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, dtype=dt, name="stem_conv1")(x)
            if stem_extra is not None:
                x = x + stem_extra
            x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name="stem_bn1")(x)
            x = nn.relu(x)
        feats = {"stem": x}
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        dilation = 1
        planes = self.width
        for stage in range(self.num_stages):
            stride = 1 if stage == 0 else 2
            if stage > 0 and self.replace_stride_with_dilation[stage - 1]:
                dilation *= stride
                stride = 1
            out_ch = planes * expansion
            x = block_cls(planes, stride, dilation,
                          use_projection=(stride != 1
                                          or x.shape[-1] != out_ch),
                          dtype=dt)(x, train)
            for _ in range(1, self.layers[stage]):
                x = block_cls(planes, 1, dilation, dtype=dt)(x, train)
            feats[f"c{stage + 1}"] = x
            planes *= 2
        return feats
