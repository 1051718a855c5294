"""DeepLabV3 / V3+ segmentation family.

TPU-native rebuild of `unscreen/binseg/deeplab/` (the variant actually used
is deeplabv3plus_resnet50, output_stride 8, ASPP dilations [12, 24, 36],
2 classes — `unscreen/binseg/deeplab_model.py:4-14`,
`deeplab/modeling.py:9-14`). NHWC flax; the backbone is the shared
`models/resnet.py` trunk with stage-3/4 dilation; logits are bilinearly
resized to the input inside the jitted forward.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNet


class ASPPConv(nn.Module):
    dilation: int
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (`deeplab/_deeplab.py:139-204`)."""
    dilations: Sequence[int] = (12, 24, 36)
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        branches = []
        b = nn.Conv(self.channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        b = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(b)
        branches.append(nn.relu(b))
        for d in self.dilations:
            branches.append(ASPPConv(d, self.channels, self.dtype)(x, train))
        # image pooling branch
        p = x.mean(axis=(1, 2), keepdims=True)
        p = nn.Conv(self.channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(p)
        p = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(p)
        p = nn.relu(p)
        branches.append(jnp.broadcast_to(p, (n, h, w, self.channels)))
        out = jnp.concatenate(branches, axis=-1)
        out = nn.Conv(self.channels, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        return nn.Dropout(0.1, deterministic=not train)(out)


class DeepLabV3Plus(nn.Module):
    """DeepLabV3+ head over a dilated ResNet (`deeplab/_deeplab.py:29-70`).

    low_level = stage-1 features projected to 48 ch; ASPP output is
    upsampled to the low-level grid, concatenated (304 ch), classified.
    """
    num_classes: int = 2
    backbone_block: str = "bottleneck"
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    output_stride: int = 8
    aspp_dilations: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, in_h, in_w, _ = x.shape
        dilate = ((False, True, True) if self.output_stride == 8
                  else (False, False, True))
        feats = ResNet(block=self.backbone_block, layers=self.backbone_layers,
                       replace_stride_with_dilation=dilate, dtype=self.dtype,
                       name="backbone")(x, train)
        low = feats["c1"]
        out = feats["c4"]

        low = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype,
                      name="project_conv")(low)
        low = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="project_bn")(low)
        low = nn.relu(low)

        out = ASPP(self.aspp_dilations, dtype=self.dtype,
                   name="aspp")(out, train)
        out = jax.image.resize(out, (n, low.shape[1], low.shape[2],
                                     out.shape[-1]), method="linear")
        out = jnp.concatenate([low, out], axis=-1)
        out = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="cls_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="cls_bn")(out)
        out = nn.relu(out)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="cls_out")(out)
        return jax.image.resize(logits, (n, in_h, in_w, self.num_classes),
                                method="linear")


class DeepLabV3(nn.Module):
    """Plain DeepLabV3 (no low-level skip): ASPP + 3x3 + classifier over
    the high-level feature (`deeplab/_deeplab.py:73-95`)."""
    num_classes: int = 2
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    output_stride: int = 8
    aspp_dilations: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, in_h, in_w, _ = x.shape
        dilate = ((False, True, True) if self.output_stride == 8
                  else (False, False, True))
        feats = ResNet(block="bottleneck", layers=self.backbone_layers,
                       replace_stride_with_dilation=dilate, dtype=self.dtype,
                       name="backbone")(x, train)
        out = ASPP(self.aspp_dilations, dtype=self.dtype,
                   name="aspp")(feats["c4"], train)
        out = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="cls_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="cls_bn")(out)
        out = nn.relu(out)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="cls_out")(out)
        return jax.image.resize(logits, (n, in_h, in_w, self.num_classes),
                                method="linear")


class DeepLabV3PlusMobileNet(nn.Module):
    """deeplabv3plus_mobilenet variant (`deeplab/modeling.py:17-45`):
    MobileNetV2 backbone, 24-ch low-level projected to 48, ASPP at the
    320-ch high-level feature."""
    num_classes: int = 2
    output_stride: int = 8
    aspp_dilations: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .mobilenetv2 import MobileNetV2Backbone
        n, in_h, in_w, _ = x.shape
        low, out = MobileNetV2Backbone(self.output_stride, self.dtype,
                                       name="backbone")(x, train)
        low = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype,
                      name="project_conv")(low)
        low = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="project_bn")(low)
        low = nn.relu(low)
        out = ASPP(self.aspp_dilations, dtype=self.dtype,
                   name="aspp")(out, train)
        out = jax.image.resize(out, (n, low.shape[1], low.shape[2],
                                     out.shape[-1]), method="linear")
        out = jnp.concatenate([low, out], axis=-1)
        out = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="cls_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="cls_bn")(out)
        out = nn.relu(out)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         name="cls_out")(out)
        return jax.image.resize(logits, (n, in_h, in_w, self.num_classes),
                                method="linear")


def build_deeplab(num_classes: int = 2, variant: str = "resnet50",
                  output_stride: int = 8, plus: bool = True,
                  dtype=jnp.float32):
    """Factory matching `deeplab/modeling.py:93-205`: deeplabv3{,plus} x
    {resnet50, resnet101, mobilenet}. The pipeline's used variant is
    deeplabv3plus_resnet50 at output_stride 8 (`deeplab_model.py:13`)."""
    if variant == "mobilenet":
        assert plus, "mobilenet is wired for the V3+ head here"
        return DeepLabV3PlusMobileNet(num_classes=num_classes,
                                      output_stride=output_stride,
                                      dtype=dtype)
    layers = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}[variant]
    cls = DeepLabV3Plus if plus else DeepLabV3
    return cls(num_classes=num_classes, backbone_layers=layers,
               output_stride=output_stride, dtype=dtype)
