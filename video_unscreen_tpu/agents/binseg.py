"""Binary segmentation agents: SegAgent (DeepLabV3+) and HumanSegAgent (SCHP).

TPU-native rebuild of `unscreen/binseg/agent.py` and
`unscreen/binseg/agent_human.py`.

SegAgent TTA design (reference `agent.py:102-174`): the sliding 513x513
crop grid + horizontal-flip duplicates become a **static leading batch
axis** of one compiled forward — crop locations are resolved on the host
per clip geometry, the crops are gathered with static slices, and the
overlap ensemble is a scatter-add with count normalization, all inside one
jit. Flip TTA folds back by flipping the prediction before the scatter.

HumanSegAgent (reference `agent_human.py:262-305`): whole-frame affine
warp to 473x473, SCHP forward, bilinear upsample of the 20-class logits,
inverse affine warp, argmax > 0. The affine matrices are host constants
per geometry; warps run on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import SCHPHumanParser, build_deeplab
from ..ops.geometry import (affine_warp_axis_aligned, imnormalize,
                            inv_pad_resize,
                            pad_resize, resize)
from ..utils.checkpoint import load_variables


def _crop_grid(h: int, w: int, crop_h: int, crop_w: int, stride_ratio: float,
               flip: bool):
    """Static crop locations, mirroring `binseg/agent.py:102-141`.

    Returns a tuple of (s_h, s_w, flipped) triples; flipped entries mean
    the crop is horizontally flipped before the model and the prediction is
    flipped back at ensemble time.
    """
    stride_h = int(np.ceil(crop_h * stride_ratio))
    stride_w = int(np.ceil(crop_w * stride_ratio))
    grid_h = int(np.ceil(float(h - crop_h) / stride_h) + 1)
    grid_w = int(np.ceil(float(w - crop_w) / stride_w) + 1)
    locs = []
    for ih in range(grid_h):
        for iw in range(grid_w):
            s_h = min(ih * stride_h + crop_h, h) - crop_h
            s_w = min(iw * stride_w + crop_w, w) - crop_w
            locs.append((s_h, s_w, False))
            if flip:
                locs.append((s_h, s_w, True))
    return tuple(locs)


class SegAgent:
    """DeepLabV3+-resnet50 binary segmentation with grid + flip TTA.

    Same constructor surface as `unscreen/binseg/agent.py:48-68`
    (`cuda_device` accepted for parity; placement is JAX's).
    """

    def __init__(self,
                 model_path: Optional[str] = None,
                 input_long_side: int = 912,
                 crop_h: int = 513,
                 crop_w: int = 513,
                 stride_ratio: float = 0.5,
                 flip: bool = True,
                 cuda_device: int = 0,
                 dtype=jnp.float32,
                 seed: int = 0):
        self.model = build_deeplab(num_classes=2, dtype=dtype)
        self.crop_h = int(crop_h)
        self.crop_w = int(crop_w)
        self.flip = bool(flip)
        self.input_long_side = int(input_long_side)
        self.stride_ratio = float(stride_ratio)
        init_in = jnp.zeros((1, 64, 64, 3), dtype)
        self.variables = self.model.init(jax.random.PRNGKey(seed), init_in)
        if model_path:
            self.variables = load_variables(model_path, self.variables)

    def get_target_size(self, h: int, w: int) -> Tuple[int, int]:
        """Long-side resize target, floored at the crop size
        (`binseg/agent.py:70-100`)."""
        if h > w:
            th, tw = self.input_long_side, int(
                float(self.input_long_side) * w / h)
        else:
            tw, th = self.input_long_side, int(
                float(self.input_long_side) * h / w)
        return max(th, self.crop_h), max(tw, self.crop_w)

    def _tta_scores(self, variables, norm: jax.Array,
                    locs: Tuple[Tuple[int, int, bool], ...],
                    crop_h: int, crop_w: int) -> jax.Array:
        """Grid+flip TTA score map over a normalized image (unjitted;
        traceable inside fused scans). Mirrors `binseg/agent.py:143-174`:
        batched crop forward, softmax, overlap scatter-add with count
        normalization."""
        target_hw = norm.shape[:2]
        crops = []
        for (s_h, s_w, flipped) in locs:
            c = jax.lax.slice(norm, (s_h, s_w, 0),
                              (s_h + crop_h, s_w + crop_w, 3))
            crops.append(c[:, ::-1] if flipped else c)
        batch = jnp.stack(crops)  # (N, crop_h, crop_w, 3)
        logits = self.model.apply(variables, batch)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        # overlap ensemble with count normalization (`agent.py:143-174`)
        acc = jnp.zeros(target_hw + (2,), jnp.float32)
        cnt = jnp.zeros(target_hw + (1,), jnp.float32)
        ones = jnp.ones((crop_h, crop_w, 1), jnp.float32)
        for i, (s_h, s_w, flipped) in enumerate(locs):
            p = probs[i][:, ::-1] if flipped else probs[i]
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(
                    acc, (s_h, s_w, 0), (crop_h, crop_w, 2)) + p,
                (s_h, s_w, 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(
                    cnt, (s_h, s_w, 0), (crop_h, crop_w, 1)) + ones,
                (s_h, s_w, 0))
        return acc / jnp.maximum(cnt, 1.0)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def device_forward(self, variables, img: jax.Array,
                       target_hw: Tuple[int, int],
                       locs: Tuple[Tuple[int, int, bool], ...]) -> jax.Array:
        """img (H, W, 3) BGR 0..255 -> mask (H, W) {0, 255} float."""
        ori_hw = img.shape[:2]
        padded = pad_resize(img, target_hw)
        norm = imnormalize(padded)
        score = self._tta_scores(variables, norm, locs,
                                 self.crop_h, self.crop_w)
        score = inv_pad_resize(score, ori_hw)
        return jnp.argmax(score, axis=-1).astype(jnp.float32) * 255.0

    def _tta_scores_sharded(self, variables, norm: jax.Array,
                            locs, crop_h: int, crop_w: int,
                            axis: str, axis_size: int) -> jax.Array:
        """`_tta_scores` with the crop batch sharded over a mesh axis
        (VERDICT r4 item 6 — the `model` axis at inference): inside a
        `shard_map` that binds `axis`, each rank forwards ceil(N/m) of
        the TTA crops (crop offsets gathered by `lax.axis_index`, so the
        same program runs everywhere) and the overlap ensembles are
        `psum`-combined over ICI. Bit-parity with the unsharded ensemble
        up to float summation order."""
        n = len(locs)
        k = -(-n // axis_size)
        pad = k * axis_size - n
        sh = jnp.asarray([l[0] for l in locs] + [0] * pad, jnp.int32)
        sw = jnp.asarray([l[1] for l in locs] + [0] * pad, jnp.int32)
        fl = jnp.asarray([bool(l[2]) for l in locs] + [False] * pad)
        valid = jnp.asarray([True] * n + [False] * pad)
        rank = jax.lax.axis_index(axis)
        target_hw = norm.shape[:2]

        crops = []
        for j in range(k):
            i = rank * k + j
            c = jax.lax.dynamic_slice(norm, (sh[i], sw[i], 0),
                                      (crop_h, crop_w, 3))
            crops.append(jnp.where(fl[i], c[:, ::-1], c))
        logits = self.model.apply(variables, jnp.stack(crops))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        acc = jnp.zeros(target_hw + (2,), jnp.float32)
        cnt = jnp.zeros(target_hw + (1,), jnp.float32)
        for j in range(k):
            i = rank * k + j
            wgt = valid[i].astype(jnp.float32)
            p = jnp.where(fl[i], probs[j][:, ::-1], probs[j]) * wgt
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(
                    acc, (sh[i], sw[i], 0), (crop_h, crop_w, 2)) + p,
                (sh[i], sw[i], 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(
                    cnt, (sh[i], sw[i], 0), (crop_h, crop_w, 1)) + wgt,
                (sh[i], sw[i], 0))
        acc = jax.lax.psum(acc, axis)
        cnt = jax.lax.psum(cnt, axis)
        return acc / jnp.maximum(cnt, 1.0)

    def predict_mask_impl(self, variables, frame: jax.Array,
                          model_axis=None) -> jax.Array:
        """Whole-frame mask at the frame's own (work) resolution, unjitted
        — the fused pipelines call this under the non-tracking `lax.cond`
        branch (reference `tools/unscreen/green.py:74-80`). The crop grid
        is clamped to the frame dims, so the shipped whole-image config
        degenerates to whole-image + flip TTA.

        `model_axis`: optional ("axis_name", size) — shard the TTA crop
        batch over that mesh axis (caller must be inside a `shard_map`
        binding it; see `_tta_scores_sharded`)."""
        h, w = frame.shape[:2]
        crop_h, crop_w = min(self.crop_h, h), min(self.crop_w, w)
        locs = _crop_grid(h, w, crop_h, crop_w, self.stride_ratio, self.flip)
        norm = imnormalize(frame)
        if model_axis is not None and model_axis[1] > 1:
            score = self._tta_scores_sharded(variables, norm, locs,
                                             crop_h, crop_w, *model_axis)
        else:
            score = self._tta_scores(variables, norm, locs, crop_h, crop_w)
        return jnp.argmax(score, axis=-1).astype(jnp.float32) * 255.0

    def forward(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        target_hw = self.get_target_size(h, w)
        locs = _crop_grid(*target_hw, self.crop_h, self.crop_w,
                          self.stride_ratio, self.flip)
        pred = self.device_forward(self.variables,
                                   jnp.asarray(img, jnp.float32),
                                   target_hw, locs)
        return np.asarray(pred).astype(np.uint8)


class ChromaSegAgent:
    """Chroma-prior segmenter: foreground = NOT near the dominant screen
    color. A weights-free seeding path for green-screen inputs (this
    framework's addition — the reference always needs a .pth); selected
    with `"type": "chroma"` in the binseg config section.

    The screen color is the H-histogram peak (the color-prior observation
    of `unscreen/colorfiltering/agent.py:113-146`), with median S/V of the
    peak pixels; the mask is the complement of the HSV window test
    (`fgfuncs.py:9-65`) cleaned by open/close morphology.
    """

    def __init__(self, input_long_side: int = 960,
                 color_winsize=(24, 140, 240), clean_iters: int = 2,
                 **_ignored):
        self.input_long_side = int(input_long_side)
        self.color_winsize = tuple(int(v) for v in color_winsize)
        self.clean_iters = int(clean_iters)

    @functools.partial(jax.jit, static_argnums=(0,))
    def device_forward(self, img: jax.Array) -> jax.Array:
        from ..ops.chroma import chroma_segment
        mask, _ = chroma_segment(img, self.color_winsize, self.clean_iters)
        return mask

    def forward(self, img: np.ndarray) -> np.ndarray:
        out = self.device_forward(jnp.asarray(img, jnp.float32))
        return np.asarray(out).astype(np.uint8)


def build_seg_agent(cfg_binseg: dict):
    """Dispatch the binseg config section to an agent implementation.

    `type` defaults to "deeplab" (the reference SegAgent); "chroma" selects
    the weights-free ChromaSegAgent; "human" the SCHP parser.
    """
    kw = dict(cfg_binseg)
    kind = kw.pop("type", "deeplab")
    if kind == "chroma":
        return ChromaSegAgent(**kw)
    if kind == "human":
        return HumanSegAgent(**kw)
    return SegAgent(**kw)


class HumanSegAgent:
    """SCHP-LIP human parsing as binary segmentation.

    Same surface as `unscreen/binseg/agent_human.py:128-312`; the dead
    grid-crop path and its flipped-count bug are intentionally not
    reproduced.
    """

    def __init__(self,
                 model_path: Optional[str] = None,
                 input_long_side: int = 912,
                 downscale: int = 1,
                 crop_h: int = 473,
                 crop_w: int = 473,
                 stride_ratio: float = 0.5,
                 flip: bool = True,
                 cuda_device: int = 0,
                 dtype=jnp.float32,
                 seed: int = 0,
                 layers=(3, 4, 23, 3)):
        # parity-only kwargs: the SCHP path is a single whole-frame affine
        # warp (no grid TTA — the reference's grid path is dead code with
        # a pdb trap, `agent_human.py:218-227`), so these knobs have no
        # effect; warn instead of silently accepting non-default values
        import warnings
        for name, val, default in (("downscale", downscale, 1),
                                   ("stride_ratio", stride_ratio, 0.5),
                                   ("flip", flip, True)):
            if val != default:
                warnings.warn(
                    f"HumanSegAgent ignores {name!r} (accepted for "
                    f"SegAgent config parity only; SCHP runs one "
                    f"whole-frame affine warp)", stacklevel=2)
        self.model = SCHPHumanParser(num_classes=20, layers=tuple(layers),
                                     dtype=dtype)
        self.input_size = (int(crop_h), int(crop_w))
        # per-instance compiled-forward cache keyed on geometry. NOT
        # functools.lru_cache on the bound method: that keys on (self,
        # ori_hw) in a class-level cache, pinning instances (weights +
        # executables) alive for the process and thrashing past maxsize
        # (ADVICE round-4 low).
        self._forward_cache: dict = {}
        init_in = jnp.zeros((1, 64, 64, 3), dtype)
        self.variables = self.model.init(jax.random.PRNGKey(seed), init_in)
        if model_path:
            self.variables = load_variables(model_path, self.variables)

    def _transforms(self, h: int, w: int):
        """Aspect-corrected person-box warp matrices
        (`agent_human.py:240-259,277-288`)."""
        ih, iw = self.input_size
        aspect = iw / ih
        cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
        bw, bh = w - 1, h - 1
        if bw > aspect * bh:
            bh = bw / aspect
        elif bw < aspect * bh:
            bw = bh * aspect
        scale_x, scale_y = iw / bw, ih / bh
        fwd = np.array([[scale_x, 0.0, iw / 2.0 - scale_x * cx],
                        [0.0, scale_y, ih / 2.0 - scale_y * cy]], np.float32)
        inv = np.array([[1.0 / scale_x, 0.0, cx - iw / (2.0 * scale_x)],
                        [0.0, 1.0 / scale_y, cy - ih / (2.0 * scale_y)]],
                       np.float32)
        return fwd, inv

    def _forward_core(self, variables, img: jax.Array, fwd: np.ndarray,
                      ori_hw: Tuple[int, int], inv: np.ndarray) -> jax.Array:
        # the person-box warp is axis-aligned (`_transforms`), so both
        # warps run as MXU matmuls — the map_coordinates form gathered
        # 4x per output pixel per channel and cost 476 ms/frame for the
        # 20-channel logits warp alone (tools/profile_stages.py)
        warped = affine_warp_axis_aligned(img, fwd, self.input_size)
        norm = imnormalize(warped)
        logits = self.model.apply(variables, norm[None])[0]
        logits = logits.astype(jnp.float32)
        logits = resize(logits, self.input_size)  # upsample 1/4 -> input
        back = affine_warp_axis_aligned(logits, inv, ori_hw)
        pred = jnp.argmax(back, axis=-1)
        return (pred > 0).astype(jnp.float32) * 255.0

    def _jitted_forward(self, ori_hw: Tuple[int, int]):
        """Compiled whole-frame forward for one geometry — the affine
        resampling matrices are trace-time constants of (h, w)."""
        fn = self._forward_cache.get(ori_hw)
        if fn is None:
            fwd, inv = self._transforms(*ori_hw)

            def run(variables, img):
                return self._forward_core(variables, img, fwd, ori_hw, inv)
            fn = self._forward_cache[ori_hw] = jax.jit(run)
        return fn

    def device_forward(self, variables, img: jax.Array,
                       ori_hw: Tuple[int, int]) -> jax.Array:
        return self._jitted_forward(ori_hw)(variables, img)

    def predict_mask_impl(self, variables, frame: jax.Array,
                          model_axis=None) -> jax.Array:
        """Whole-frame person mask at the frame's own resolution, unjitted
        — the fused bg pipeline's seed segmenter (reference
        `tools/unscreen/bg.py:56` calling `agent_human.py:262-305`). The
        affine matrices are trace-time constants of the work geometry.
        `model_axis` is accepted for seed-segmenter interface parity
        (SegAgent shards its TTA crop batch; SCHP is one whole-frame
        forward, nothing to shard)."""
        del model_axis
        h, w = frame.shape[:2]
        fwd, inv = self._transforms(h, w)
        return self._forward_core(variables, frame, fwd, (h, w), inv)

    def forward(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        pred = self.device_forward(self.variables,
                                   jnp.asarray(img, jnp.float32), (h, w))
        return np.asarray(pred).astype(np.uint8)
