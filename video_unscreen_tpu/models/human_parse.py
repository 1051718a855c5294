"""SCHP human parser (LIP, 20 classes).

TPU-native rebuild of `unscreen/binseg/human_parse.py`: deep-stem dilated
ResNet-101 trunk (stage-4 stride 1 dilation 2 -> output stride 16), PSP
context module, edge branch over c1/c2/c3, parsing decoder, and a fusion
head producing the 20-class logits consumed by HumanSegAgent
(`unscreen/binseg/agent_human.py:262-305`). InPlaceABNSync degrades to
BN + LeakyReLU in the reference (`human_parse.py:25-39`); we keep that
exact semantic as `_abn`.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import Bottleneck


class _ABN(nn.Module):
    """BN + LeakyReLU (the reference's InPlaceABNSync stand-in)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.01)


def _resize_to(x, h, w):
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, h, w, c), method="linear")


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling (`human_parse.py:83-111`)."""
    out_features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        priors = []
        for size in self.sizes:
            p = _adaptive_avg_pool(x, size)
            p = nn.Conv(self.out_features, (1, 1), use_bias=False,
                        dtype=self.dtype)(p)
            p = _ABN(self.dtype)(p, train)
            priors.append(_resize_to(p, h, w))
        priors.append(x)
        out = jnp.concatenate(priors, axis=-1)
        out = nn.Conv(self.out_features, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        return _ABN(self.dtype)(out, train)


def _adaptive_avg_pool(x, size: int):
    """Exact adaptive average pooling to (size, size) bins.

    PyTorch bin semantics — start = floor(i*h/size), end = ceil((i+1)*h/
    size) — so every bin covers >= 1 pixel even when the feature map is
    smaller than `size` (empty bins would mean() to NaN)."""
    import math
    n, h, w, c = x.shape
    ys = [(math.floor(i * h / size), math.ceil((i + 1) * h / size))
          for i in range(size)]
    xs = [(math.floor(j * w / size), math.ceil((j + 1) * w / size))
          for j in range(size)]
    rows = []
    for y0, y1 in ys:
        cols = []
        for x0, x1 in xs:
            cols.append(x[:, y0:y1, x0:x1].mean((1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (n, size, size, c)


class EdgeModule(nn.Module):
    """Edge branch over c1/c2/c3 (`human_parse.py:114-156`)."""
    mid_fea: int = 256
    out_fea: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        _, h, w, _ = x1.shape
        conv4 = nn.Conv(self.out_fea, (3, 3), padding=1, dtype=self.dtype,
                        name="conv4")  # shared across scales

        def branch(x, idx):
            fea = nn.Conv(self.mid_fea, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f"conv{idx}")(x)
            fea = _ABN(self.dtype)(fea, train)
            return fea, conv4(fea)

        fea1, e1 = branch(x1, 1)
        fea2, e2 = branch(x2, 2)
        fea3, e3 = branch(x3, 3)
        fea2, fea3 = _resize_to(fea2, h, w), _resize_to(fea3, h, w)
        e2, e3 = _resize_to(e2, h, w), _resize_to(e3, h, w)
        edge = nn.Conv(self.out_fea, (1, 1), dtype=self.dtype, name="conv5")(
            jnp.concatenate([e1, e2, e3], axis=-1))
        edge_fea = jnp.concatenate([fea1, fea2, fea3], axis=-1)
        return edge, edge_fea


class DecoderModule(nn.Module):
    """Parsing decoder (`human_parse.py:159-191`)."""
    num_classes: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt, xl, train: bool = False):
        _, h, w, _ = xl.shape
        xt = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype)(xt)
        xt = _ABN(self.dtype)(xt, train)
        xt = _resize_to(xt, h, w)
        xl = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype)(xl)
        xl = _ABN(self.dtype)(xl, train)
        x = jnp.concatenate([xt, xl], axis=-1)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = _ABN(self.dtype)(x, train)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = _ABN(self.dtype)(x, train)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(x)
        return seg, x


class SCHPHumanParser(nn.Module):
    """Full SCHP network (`human_parse.py:194-265`): deep stem, dilated
    resnet101 stages, PSP, edge + parsing + fusion branches. Returns the
    fusion logits at input/4 resolution (the agent upsamples)."""
    num_classes: int = 20
    layers: Sequence[int] = (3, 4, 23, 3)
    dtype: Any = jnp.float32

    def _stage(self, x, planes, blocks, stride, dilation, train, name):
        out_ch = planes * 4
        x = Bottleneck(planes, stride, dilation,
                       use_projection=(stride != 1 or x.shape[-1] != out_ch),
                       dtype=self.dtype, name=f"{name}_0")(x, train)
        for i in range(1, blocks):
            x = Bottleneck(planes, 1, dilation, dtype=self.dtype,
                           name=f"{name}_{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        # deep stem: 3x3 s2 -> 3x3 -> 3x3 widening to 128
        for i, (ch, s) in enumerate(((64, 2), (64, 1), (128, 1))):
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                        use_bias=False, dtype=dt, name=f"stem_conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=dt,
                             name=f"stem_bn{i + 1}")(x)
            x = nn.relu(x)
        x1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x2 = self._stage(x1, 64, self.layers[0], 1, 1, train, "layer1")
        x3 = self._stage(x2, 128, self.layers[1], 2, 1, train, "layer2")
        x4 = self._stage(x3, 256, self.layers[2], 2, 1, train, "layer3")
        x5 = self._stage(x4, 512, self.layers[3], 1, 2, train, "layer4")

        ctx = PSPModule(dtype=dt, name="psp")(x5, train)
        parsing_result, parsing_fea = DecoderModule(
            self.num_classes, dtype=dt, name="decoder")(ctx, x2, train)
        edge_result, edge_fea = EdgeModule(dtype=dt, name="edge")(
            x2, x3, x4, train)
        fused = jnp.concatenate([parsing_fea, edge_fea], axis=-1)
        fused = nn.Conv(256, (1, 1), use_bias=False, dtype=dt,
                        name="fusion_conv1")(fused)
        fused = _ABN(dt)(fused, train)
        fused = nn.Dropout(0.1, deterministic=not train)(fused)
        return nn.Conv(self.num_classes, (1, 1), dtype=dt,
                       name="fusion_out")(fused)
