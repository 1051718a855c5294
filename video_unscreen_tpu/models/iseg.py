"""Interactive-segmentation model (DistMaps + DeepLabV3+ + SepConvHead).

TPU-native rebuild of `unscreen/iseg/brs/models/`: click coordinates become
min-distance `tanh(2*sqrt(d))` maps (`distmap.py:79-124`), fused with RGB
through a 1x1 rgb_conv (`distmap.py:14-20`), fed to a DeepLabV3+ variant
with a skip-project + ASPP (`deeplab_v3.py:11-93`, ch=128), classified by a
depthwise-separable SepConvHead (`basic_blocks.py:46-121`).

Clicks are a fixed-size (max_clicks, 3) tensor of (is_positive, y, x) with
y < 0 marking empty slots — shape-static, so BRS optimization can
differentiate through one compiled forward.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .deeplab import ASPP
from .resnet import ResNet


def dist_maps(points: jax.Array, h: int, w: int,
              norm_radius: float = 260.0) -> jax.Array:
    """Click coordinate features (`distmap.py:79-124`).

    points: (B, N, 3) rows of (is_positive, y, x); y < 0 = invalid slot.
    Returns (B, H, W, 2): [positive-map, negative-map], each
    tanh(2*sqrt(min_d2)) of the normalized squared distance to the nearest
    click of that polarity.
    """
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def per_image(pts):
        is_pos = pts[:, 0] > 0.5
        valid = pts[:, 1] >= 0
        dy = (ys[None] - pts[:, 1, None, None]) / norm_radius
        dx = (xs[None] - pts[:, 2, None, None]) / norm_radius
        d2 = dy * dy + dx * dx  # (N, H, W)
        d2 = jnp.where(valid[:, None, None], d2, 1e6)
        pos = jnp.min(jnp.where(is_pos[:, None, None], d2, 1e6), axis=0)
        neg = jnp.min(jnp.where(is_pos[:, None, None], 1e6, d2), axis=0)
        feat = jnp.stack([pos, neg], axis=-1)
        return jnp.tanh(2.0 * jnp.sqrt(feat))

    return jax.vmap(per_image)(points)


class SepConvHead(nn.Module):
    """Depthwise-separable head (`basic_blocks.py:46-121`)."""
    num_outputs: int
    mid_channels: int
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            ch = x.shape[-1]
            x = nn.Conv(ch, (3, 3), padding=1, feature_group_count=ch,
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype)(x)


class BRSDeepLabV3Plus(nn.Module):
    """DeepLab variant used by BRS (`deeplab_v3.py:11-93`): resnet50
    backbone, skip-project c1 -> 32, ASPP(ch) at c4, separable head
    producing ch-dim features at 1/4."""
    ch: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet(block="bottleneck", layers=(3, 4, 6, 3),
                       dtype=self.dtype, name="backbone")(x, train)
        c1, c4 = feats["c1"], feats["c4"]
        skip = nn.Conv(32, (3, 3), padding=1, use_bias=False,
                       dtype=self.dtype, name="skip_conv")(c1)
        skip = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                            name="skip_bn")(skip)
        skip = nn.relu(skip)
        a = ASPP((12, 24, 36), self.ch, self.dtype, name="aspp")(c4, train)
        n, h, w, c = skip.shape
        a = jax.image.resize(a, (n, h, w, a.shape[-1]), method="linear")
        x = jnp.concatenate([a, skip], axis=-1)
        # _DeepLabHead: two separable convs to ch
        x = SepConvHead(self.ch, self.ch, num_layers=2, dtype=self.dtype,
                        name="head")(x, train)
        return x


class DistMapsModel(nn.Module):
    """Full click-to-mask model (`distmap.py:5-66` + `agent.py:28-50`)."""
    ch: int = 128
    norm_radius: float = 260.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, points, train: bool = False):
        """image: (B, H, W, 3) normalized; points: (B, N, 3)."""
        n, h, w, _ = image.shape
        coord = dist_maps(points, h, w, self.norm_radius)
        x = jnp.concatenate([image, coord], axis=-1)
        x = nn.Conv(8, (1, 1), dtype=self.dtype, name="rgb_conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="rgb_bn")(x)
        x = nn.Conv(3, (1, 1), dtype=self.dtype, name="rgb_conv2")(x)
        feats = BRSDeepLabV3Plus(self.ch, self.dtype,
                                 name="feature_extractor")(x, train)
        out = SepConvHead(1, self.ch // 2, num_layers=2, dtype=self.dtype,
                          name="inst_head")(feats, train)
        return jax.image.resize(out, (n, h, w, 1), method="linear")
