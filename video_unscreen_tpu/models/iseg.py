"""Interactive-segmentation model (DistMaps + DeepLabV3+ + SepConvHead).

TPU-native rebuild of `unscreen/iseg/brs/models/`: click coordinates become
min-distance `tanh(2*sqrt(d))` maps (`distmap.py:79-124`), fused with RGB
through a 1x1 rgb_conv (`distmap.py:14-20`), fed to a DeepLabV3+ variant
with a skip-project + ASPP (`deeplab_v3.py:11-93`, ch=128), classified by a
depthwise-separable SepConvHead (`basic_blocks.py:46-121`).

Clicks are a fixed-size (max_clicks, 3) tensor of (is_positive, y, x) with
y < 0 marking empty slots — shape-static, so BRS optimization can
differentiate through one compiled forward. The forward exposes an
`after_aspp` insertion point: per-channel (1 + scale, bias) applied to the
concat of upsampled-ASPP + skip features (160 ch), which is exactly what
`FeatureBRSPredictor(insertion_mode='after_aspp')` optimizes
(`brs_predictor.py:143-162`).
"""

from __future__ import annotations

from typing import Any, Optional

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
    backbone, skip-project c1 -> 32, ASPP(ch=128) at c4, separable head
    producing ch-dim features at 1/4.

    `features()` returns the pre-head `after_aspp` tensor (160 ch);
    `head()` finishes the computation — the split lets the BRS optimizer
    re-run only the cheap head under its scale/bias perturbation.
    """
    ch: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(block="bottleneck", layers=(3, 4, 6, 3),
                               dtype=self.dtype)
        self.skip_conv = nn.Conv(32, (3, 3), padding=1, use_bias=False,
                                 dtype=self.dtype)
        self.skip_bn = nn.BatchNorm(dtype=self.dtype)
        self.aspp = ASPP((12, 24, 36), self.ch, self.dtype)
        self.head_module = SepConvHead(self.ch, self.ch, num_layers=2,
                                       dtype=self.dtype)

    def backbone_feats(self, x, train: bool = False):
        """(skip, c4): the `after_c4` insertion point plus the unperturbed
        skip branch needed to finish from it."""
        feats = self.backbone(x, train)
        c1, c4 = feats["c1"], feats["c4"]
        skip = self.skip_conv(c1)
        skip = self.skip_bn(skip, use_running_average=not train)
        skip = nn.relu(skip)
        return skip, c4

    def aspp_concat(self, skip, c4, train: bool = False):
        """ASPP at c4, upsampled and concatenated with the skip branch —
        the `after_aspp` tensor (ch + 32)."""
        a = self.aspp(c4, train)
        n, h, w, _ = skip.shape
        a = jax.image.resize(a, (n, h, w, a.shape[-1]), method="linear")
        return jnp.concatenate([a, skip], axis=-1)  # (N, H/4, W/4, ch+32)

    def features(self, x, train: bool = False):
        return self.aspp_concat(*self.backbone_feats(x, train), train)

    def head(self, after_aspp, train: bool = False):
        return self.head_module(after_aspp, train)

    def __call__(self, x, train: bool = False):
        return self.head(self.features(x, train), train)


class DistMapsModel(nn.Module):
    """Full click-to-mask model (`distmap.py:5-66` + `iseg/agent.py:28-50`)."""
    ch: int = 128
    norm_radius: float = 260.0
    dtype: Any = jnp.float32

    def setup(self):
        self.rgb_conv1 = nn.Conv(8, (1, 1), dtype=self.dtype)
        self.rgb_bn = nn.BatchNorm(dtype=self.dtype)
        self.rgb_conv2 = nn.Conv(3, (1, 1), dtype=self.dtype)
        self.feature_extractor = BRSDeepLabV3Plus(self.ch, self.dtype)
        self.inst_head = SepConvHead(1, self.ch // 2, num_layers=2,
                                     dtype=self.dtype)

    def _fuse(self, image, points, train):
        n, h, w, _ = image.shape
        coord = dist_maps(points, h, w, self.norm_radius)
        x = jnp.concatenate([image, coord], axis=-1)
        x = self.rgb_conv1(x)
        x = nn.leaky_relu(x, 0.2)
        x = self.rgb_bn(x, use_running_average=not train)
        return self.rgb_conv2(x)

    def features(self, image, points, train: bool = False,
                 insertion_mode: str = "after_aspp"):
        """Features at the BRS insertion point (`brs_predictor.py:143-162`
        offers after_aspp / after_c4 / after_deeplab).

        Returns (feats, aux): `feats` is the tensor the optimizer
        perturbs; `aux` carries the unperturbed side branch needed to
        finish (the skip tensor for after_c4, else None).
        """
        x = self._fuse(image, points, train)
        skip, c4 = self.feature_extractor.backbone_feats(x, train)
        if insertion_mode == "after_c4":
            return c4, skip
        after_aspp = self.feature_extractor.aspp_concat(skip, c4, train)
        if insertion_mode == "after_aspp":
            return after_aspp, None
        if insertion_mode == "after_deeplab":
            return self.feature_extractor.head(after_aspp, train), None
        raise ValueError(f"unknown insertion_mode {insertion_mode!r}")

    def logits_from_features(self, feats, out_hw,
                             scale: Optional[jax.Array] = None,
                             bias: Optional[jax.Array] = None,
                             train: bool = False,
                             insertion_mode: str = "after_aspp",
                             aux: Optional[jax.Array] = None):
        """Finish the forward from the insertion point, optionally applying
        the per-channel BRS perturbation feats*(1+scale)+bias
        (`brs_optimizer.py:118-133`)."""
        if scale is not None:
            feats = feats * (1.0 + scale) + bias
        if insertion_mode == "after_c4":
            feats = self.feature_extractor.aspp_concat(aux, feats, train)
            insertion_mode = "after_aspp"
        if insertion_mode == "after_aspp":
            feats = self.feature_extractor.head(feats, train)
        elif insertion_mode != "after_deeplab":
            raise ValueError(f"unknown insertion_mode {insertion_mode!r}")
        out = self.inst_head(feats, train)
        n = out.shape[0]
        return jax.image.resize(out, (n,) + tuple(out_hw) + (1,),
                                method="linear")

    def __call__(self, image, points, train: bool = False):
        """image: (B, H, W, 3) normalized; points: (B, N, 3)."""
        h, w = image.shape[1:3]
        after_aspp, _ = self.features(image, points, train)
        return self.logits_from_features(after_aspp, (h, w), train=train)
