"""Matting UNet — the temporal alpha-matte refiner (flagship model).

TPU-native rebuild of `unscreen/vmatting/model.py` ("unet18_vid"): a
ResShortCut encoder/decoder with resnet18-shaped stages [2, 2, 2, 2], input
3+4 channels (RGB + previous alpha + 3-channel one-hot trimap), five
shortcut stacks, transpose-conv decoder, `(tanh+1)/2` output.

TPU-first differences from the reference:
- NHWC layout; convs hit the MXU as implicit GEMMs, bf16 compute optional.
- SpectralNorm (reference wraps every conv, `model.py:45-113`) is an
  inference-time weight transform: at load/init we fold `w <- w / sigma`
  (one power-iteration pass on the host) instead of carrying u/v vectors
  through every forward. Training keeps plain convs (the reference only
  ever runs this net in inference).
- BatchNorm carries running stats (`batch_stats` collection); inference
  uses them, the training step updates them.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SubpixelConvTranspose(nn.Module):
    """Bit-exact `nn.ConvTranspose(k=(4,4), s=(2,2), padding='SAME')` as
    four 2x2 phase convs + pixel-shuffle interleave.

    XLA lowers a fractionally-strided conv on TPU as a conv over the
    lhs-dilated (zero-stuffed) input, paying the full k^2=16-tap cost per
    output pixel even though only k^2/s^2=4 taps land on real samples.
    Decomposing by output phase (r, c) in {0,1}^2 — each phase sees a
    fixed 2x2 slice `kernel[r::2, c::2]` of the 4x4 kernel over a 2x2
    input window — does the same arithmetic with 4x fewer MACs. The five
    k4s2 transpose convs are ~half the UNet's FLOPs (VERDICT r4 item 2:
    the matting UNet is the top line in both mode budgets), so this is a
    pure-win rewrite: same param name/shape ("kernel", (4,4,Cin,Cout)),
    so shipped msgpack checkpoints load unchanged, and outputs match
    `nn.ConvTranspose` to float rounding (gated in
    tests/test_models.py::TestSubpixelConvTranspose).

    Semantics to preserve: torch ConvTranspose2d(k=4, s=2, p=1), the
    reference's upsampler (`vmatting/model.py:287,492-515`).
    """
    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, cin,
                                                       self.features))
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        n, h, w, _ = x.shape
        phases = []
        for r in (0, 1):
            for c in (0, 1):
                # dilated-coords SAME padding is pad_lo=2: phase taps are
                # kernel[r::2, c::2]; the 2x2 input window starts at
                # i-1 (phase 0) / i (phase 1) per dimension.
                kk = k[r::2, :][:, c::2]
                pad = ((1 - r, r), (1 - c, c))
                phases.append(jax.lax.conv_general_dilated(
                    x, kk, window_strides=(1, 1), padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype))
        # (n,h,w,4,f) with phase axis ordered (r,c) -> (n,h,2,w,2,f)
        y = jnp.stack(phases, axis=3).reshape(n, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w,
                                                  self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class BasicBlockEnc(nn.Module):
    """Encoder residual block (`vmatting/model.py:119-157`)."""
    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        if self.use_projection:
            # AvgPool(2) + 1x1 conv + BN (`vmatting/model.py:233-243`)
            if self.stride != 1:
                identity = nn.avg_pool(identity, (2, 2),
                                       strides=(self.stride,) * 2)
            identity = nn.Conv(self.planes, (1, 1), use_bias=False,
                               dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class BasicBlockDec(nn.Module):
    """Decoder residual block (`vmatting/model.py:274-324`)."""
    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        inplanes = x.shape[-1]
        if self.stride > 1:
            # torch ConvTranspose2d(k=4, s=2, p=1) == exact 2x upsample;
            # explicit name keeps the pre-rewrite checkpoint param path.
            out = SubpixelConvTranspose(inplanes, dtype=self.dtype,
                                        name="ConvTranspose_0")(x)
        else:
            out = nn.Conv(inplanes, (3, 3), padding=1, use_bias=False,
                          dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        out = nn.leaky_relu(out, 0.2)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           dtype=self.dtype)(out)
        if self.use_projection:
            # nearest-upsample + 1x1 conv + BN (`vmatting/model.py:392-397`)
            if self.stride != 1:
                n, h, w, c = identity.shape
                identity = jax.image.resize(identity, (n, h * 2, w * 2, c),
                                            method="nearest")
            identity = nn.Conv(self.planes, (1, 1), use_bias=False,
                               dtype=self.dtype)(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(identity)
        return nn.leaky_relu(out + identity, 0.2)


class ShortcutStack(nn.Module):
    """conv3x3-ReLU-BN twice (`vmatting/model.py:454-458`)."""
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)


class MattingUNet(nn.Module):
    """ResShortCut encoder/decoder matting net (`vmatting/model.py:552-568`).

    Input: (N, H, W, 7) = RGB(normalized) + alpha_pre + one-hot trimap,
    H, W divisible by 32. Output: (N, H, W, 1) alpha in [0, 1].
    """
    layers: Sequence[int] = (2, 2, 2, 2)
    midplanes: int = 32
    dtype: Any = jnp.float32

    def _stage_enc(self, x, planes, blocks, stride, train):
        x = BasicBlockEnc(planes, stride,
                          use_projection=(stride != 1
                                          or x.shape[-1] != planes),
                          dtype=self.dtype)(x, train)
        for _ in range(1, blocks):
            x = BasicBlockEnc(planes, dtype=self.dtype)(x, train)
        return x

    def _stage_dec(self, x, planes, blocks, stride, train):
        x = BasicBlockDec(planes, stride,
                          use_projection=(stride != 1
                                          or x.shape[-1] != planes),
                          dtype=self.dtype)(x, train)
        for _ in range(1, blocks):
            x = BasicBlockDec(planes, dtype=self.dtype)(x, train)
        return x

    @nn.compact
    def __call__(self, img, alpha_pre, trimap, train: bool = False):
        x = jnp.concatenate([img, alpha_pre, trimap], axis=-1)
        dt = self.dtype
        nra = not train

        # --- encoder stem (`vmatting/model.py:460-471`) ---
        out = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                      dtype=dt, name="enc_conv1")(x)
        out = nn.BatchNorm(use_running_average=nra, dtype=dt,
                           name="enc_bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.midplanes, (3, 3), padding=1, use_bias=False,
                      dtype=dt, name="enc_conv2")(out)
        out = nn.BatchNorm(use_running_average=nra, dtype=dt,
                           name="enc_bn2")(out)
        x1 = nn.relu(out)                      # (N, H/2, W/2, 32)
        out = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                      dtype=dt, name="enc_conv3")(x1)
        out = nn.BatchNorm(use_running_average=nra, dtype=dt,
                           name="enc_bn3")(out)
        out = nn.relu(out)                     # (N, H/4, W/4, 64)

        x2 = self._stage_enc(out, 64, self.layers[0], 1, train)   # H/4
        x3 = self._stage_enc(x2, 128, self.layers[1], 2, train)   # H/8
        x4 = self._stage_enc(x3, 256, self.layers[2], 2, train)   # H/16
        out = self._stage_enc(x4, 512, self.layers[3], 2, train)  # H/32

        # --- shortcut stacks (`vmatting/model.py:477-481`) ---
        fea1 = ShortcutStack(32, dt)(x, train)
        fea2 = ShortcutStack(self.midplanes, dt)(x1, train)
        fea3 = ShortcutStack(64, dt)(x2, train)
        fea4 = ShortcutStack(128, dt)(x3, train)
        fea5 = ShortcutStack(256, dt)(x4, train)

        # --- decoder (`vmatting/model.py:505-515`) ---
        out = self._stage_dec(out, 256, self.layers[0], 2, train) + fea5
        out = self._stage_dec(out, 128, self.layers[1], 2, train) + fea4
        out = self._stage_dec(out, 64, self.layers[2], 2, train) + fea3
        out = self._stage_dec(out, self.midplanes, self.layers[3], 2,
                              train) + fea2
        out = SubpixelConvTranspose(32, dtype=dt, name="dec_conv1")(out)
        out = nn.BatchNorm(use_running_average=nra, dtype=dt,
                           name="dec_bn1")(out)
        out = nn.leaky_relu(out, 0.2) + fea1
        raw = nn.Conv(1, (3, 3), padding=1, dtype=dt, name="dec_conv2")(out)
        return (jnp.tanh(raw) + 1.0) / 2.0


def spectral_normalize_tree(params, n_power_iterations: int = 20,
                            seed: int = 0):
    """Fold spectral normalization into every conv kernel: w <- w / sigma.

    The reference wraps each conv in SpectralNorm (`vmatting/model.py:45-113`)
    and divides by the leading singular value at every forward; at inference
    this is a constant weight transform, so we apply it once. `sigma` is
    estimated by power iteration on the (out, in*kh*kw) matricization.
    """
    rng = np.random.RandomState(seed)

    def fold(path, w):
        if w.ndim != 4 or path[-1] != "kernel":
            return w
        mat = np.asarray(w).reshape(-1, w.shape[-1]).T  # (out, rest)
        u = rng.randn(mat.shape[0]).astype(np.float64)
        for _ in range(n_power_iterations):
            v = mat.T @ u
            v /= np.linalg.norm(v) + 1e-12
            u = mat @ v
            u /= np.linalg.norm(u) + 1e-12
        sigma = float(u @ mat @ v)
        return w / max(sigma, 1e-12)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    folded = [fold(tuple(getattr(k, "key", getattr(k, "name", str(k)))
                         for k in path), w) for path, w in flat]
    return jax.tree_util.tree_unflatten(treedef, folded)
