"""Fused bg mode — background-estimation unscreen as one compiled scan.

Device-resident rebuild of `tools/unscreen/bg.py` (the modular driver is
`pipeline/bg.py`). Per frame, inside one `lax.scan`:

  seg (STM tracking from the previous frame | chroma/neural seed)
  -> object removal -> trimap -> matting pass 1
  -> per-frame background: (1-a)*frame + CG regionfill of the hole
  -> background-difference mask -> matting pass 2 -> fg un-blend

Key structural observation: the reference's STM call in bg mode always
sees exactly two frames (`bg.py:53`), i.e. memorize(prev, alpha_pre) then
segment(cur) — no persistent bank. The scan carry is therefore just
(alpha_pre, tracking, normalized previous frame); the STM ring buffer is
only needed by the general STMAgent (`agents/stm.py`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.stm import STMAgent
from ..agents.vmatting import VMattingAgent
from ..ops import morphology as morph
from ..ops.color import bgr2gray, bgr2hsv, hsv2bgr
from ..ops.compositing import get_fg
from ..ops.connected import remove_invalid_objects_ds
from ..ops.geometry import get_target_size, imnormalize, resize
from ..ops.regionfill import regionfill
from ..ops.trimap import generate_trimap
from ..parallel.streaming import FrameStreamer
from .common import build_score_map
from .fused_green import _build_seed_segmenter, _canon, seed_mask


class BgCarry(NamedTuple):
    alpha_pre: jax.Array    # (H, W) work-res
    tracking: jax.Array     # scalar bool
    frame_prev: jax.Array   # (H, W, 3) normalized previous frame
    fid: jax.Array          # scalar int32


class FusedBgPipeline:
    """Compiled bg-mode runner for one clip geometry."""

    def __init__(self, cfg: dict, frame_hw: Tuple[int, int],
                 work_long_side: int = 960, use_stm_tracking: bool = True,
                 matting_dtype=jnp.bfloat16, stm_dtype=jnp.bfloat16,
                 seg_dtype=jnp.bfloat16, wire: str = "yuv420"):
        self.cfg = cfg
        self.wire = wire  # see FusedGreenPipeline: I420 host->HBM format
        self.ori_hw = tuple(frame_hw)
        # one work resolution, divisible by 32 (matting) and 16 (STM)
        self.work_hw = get_target_size(frame_hw[0], frame_hw[1],
                                       work_long_side, division=32)
        self.vmat = VMattingAgent(
            model_path=cfg["vmatting"].get("model_path"),
            input_long_side=work_long_side, dtype=matting_dtype)
        self.use_stm = bool(use_stm_tracking)
        if self.use_stm:
            self.stm = STMAgent(model_path=cfg["stm"].get("model_path"),
                                input_long_side=work_long_side,
                                dtype=stm_dtype)
        # seed segmenter for non-tracking frames (reference bg mode runs
        # the SCHP HumanSegAgent there, `tools/unscreen/bg.py:56`)
        self.seg = _build_seed_segmenter(cfg.get("binseg", {}), seg_dtype)
        self.score_map = jnp.asarray(
            build_score_map(self.work_hw[0], self.work_hw[1], cfg))
        self.fg_exist_thr = float(cfg["fg_exist_thr"])
        self.bg_mask_thr = float(cfg["bg_mask"]["thr"])
        self.saliency_thr = float(cfg["objectremoval"]["saliency_thr"])
        self.consensus_thr = float(cfg["objectremoval"]["consensus_thr"])
        tri = cfg["trimap"]
        self.tri_kernel = int(tri["kernelsize"])
        self.tri_iters = int(tri["iters"])

    def init_carry(self) -> BgCarry:
        h, w = self.work_hw
        return _canon(BgCarry(
            alpha_pre=jnp.zeros((h, w), jnp.float32),
            tracking=jnp.asarray(False),
            frame_prev=jnp.zeros((h, w, 3), jnp.float32),
            fid=jnp.asarray(0, jnp.int32)))

    # -- sub-stages ----------------------------------------------------------
    def _segment(self, carry: BgCarry, frame, norm):
        """STM tracking when a subject was present, else the seed
        segmenter — SCHP/DeepLab per the binseg config, chroma as the
        weights-free fallback (`bg.py:49-56`)."""
        if not self.use_stm:
            return jax.lax.cond(
                carry.tracking & (carry.fid > 0),
                lambda op: op[0],
                lambda op: seed_mask(self.seg, op[1]),
                (carry.alpha_pre, frame))

        def stm_branch(args):
            norm_, carry_ = args
            mask_prev = (carry_.alpha_pre >= 128).astype(jnp.float32)
            k, v = self.stm.model.apply(
                self.stm.variables, carry_.frame_prev[None],
                mask_prev[None], 1.0 - mask_prev[None],
                method=lambda m, f, mf, mb: m.memorize(f, mf, mb))
            logits = self.stm.model.apply(
                self.stm.variables, norm_[None], k[:, None], v[:, None],
                jnp.asarray([[True]]),
                method=lambda m, f, mk, mv, vl: m.segment(f, mk, mv, vl))
            pred = jnp.argmax(logits[0], axis=-1).astype(jnp.float32)
            return pred * 255.0

        def seed_branch(args):
            return seed_mask(self.seg, frame)

        use_track = carry.tracking & (carry.fid > 0)
        return jax.lax.cond(use_track, stm_branch, seed_branch,
                            (norm, carry))

    def _matting_pass(self, frame, alpha_pre, mask):
        """object removal -> trimap -> matting (`bg.py:67-70,92-95`)."""
        alphaor = remove_invalid_objects_ds(
            mask, mask, self.score_map, saliency_thr=self.saliency_thr,
            consensus_thr=self.consensus_thr, downscale=2)
        trimap = generate_trimap(alphaor, self.tri_kernel, self.tri_iters)
        return self.vmat.device_forward_impl(
            self.vmat.variables, frame, alpha_pre, trimap, self.work_hw)

    def _per_frame_background(self, frame, alpha):
        """(1-a)*frame, regionfill behind dilated binarized alpha
        (`bg.py:71-83`). The V-channel un-blend + 3-channel CG solve stays
        on device; half-res solve like the reference's factor handling."""
        a = (alpha / 255.0)[..., None]
        bg = jnp.clip((1.0 - a) * bgr2hsv(frame), 0.0, 255.0)
        bg = hsv2bgr(bg)
        hole = morph.dilate(jnp.where(alpha > 128, 255.0, 0.0), 3, 2)
        channels = [regionfill(bg[..., c], hole, 0.5, cg_iters=200)
                    for c in range(3)]
        return jnp.stack(channels, axis=-1)

    # -- per-frame step --------------------------------------------------------
    def _step(self, carry: BgCarry, frame_full: jax.Array):
        h, w = self.work_hw
        frame = frame_full.astype(jnp.float32)
        if frame.shape[:2] != self.work_hw:
            frame = resize(frame, self.work_hw)
        norm = imnormalize(frame)

        segmask = self._segment(carry, frame, norm)
        fg_exists = (segmask >= 128).sum() > self.fg_exist_thr * h * w

        # matting pass 1 + background estimation
        alpha1 = self._matting_pass(frame, carry.alpha_pre, segmask)
        bgimg = self._per_frame_background(frame, alpha1)

        # background-difference mask (`bg.py:85-89`)
        diff = bgr2gray(jnp.abs(frame - bgimg))
        alphabg = jnp.where(diff > self.bg_mask_thr, 255.0, diff)
        alphabg = morph.dilate(jnp.clip(alphabg, 0.0, 255.0), 4, 2)

        # matting pass 2 on alpha * bgmask
        alpha_ensm = alpha1 * jnp.floor(alphabg / 255.0)
        alpha = self._matting_pass(frame, carry.alpha_pre, alpha_ensm)

        # fg un-blend (`bg.py:99-102`)
        bg_final = jnp.where((alpha == 0)[..., None], frame, bgimg)
        fg = get_fg(frame, alpha, bg_final)

        alpha = jnp.where(fg_exists, alpha, 0.0)
        fg = jnp.where(fg_exists, fg, 0.0)

        tracking = (alpha >= 128).sum() > self.fg_exist_thr * h * w
        new_carry = _canon(BgCarry(alpha_pre=alpha, tracking=tracking,
                                   frame_prev=norm, fid=carry.fid + 1))
        packed = jnp.concatenate(
            [alpha[..., None], segmask[..., None], fg, bg_final],
            axis=-1).astype(jnp.uint8)
        return new_carry, packed

    @functools.partial(jax.jit, static_argnums=(0,))
    def process_chunk(self, carry: BgCarry, frames: jax.Array):
        if frames.ndim == 3:  # (N, H*3/2, W) I420 uint8 wire format
            from ..ops.color import yuv420_to_bgr
            frames = jax.vmap(yuv420_to_bgr)(frames)
        return jax.lax.scan(self._step, carry, frames)

    # -- host driver -----------------------------------------------------------
    def run(self, frames, chunk_size: int = 4, host_downscale: bool = True):
        """Returns (alphas, segmasks, fgs, bgs) uint8 at work res."""
        import cv2
        carry = self.init_carry()
        wh = (self.work_hw[1], self.work_hw[0])

        def preprocess(arr):
            if host_downscale and arr.shape[1:3] != self.work_hw:
                arr = np.stack([cv2.resize(f, wh) for f in arr])
            if self.wire == "yuv420":
                arr = np.stack([
                    cv2.cvtColor(np.ascontiguousarray(f, np.uint8),
                                 cv2.COLOR_BGR2YUV_I420) for f in arr])
            return arr

        outs, lengths = [], []
        for chunk in FrameStreamer(frames, chunk_size=chunk_size,
                                   preprocess=preprocess):
            n = chunk.shape[0]
            if n < chunk_size:
                pad = jnp.tile(chunk[-1:],
                               (chunk_size - n,) + (1,) * (chunk.ndim - 1))
                chunk = jnp.concatenate([chunk, pad], axis=0)
            carry, packed = self.process_chunk(carry, chunk)
            packed.copy_to_host_async()
            outs.append(packed)
            lengths.append(n)
        parts = [np.asarray(p)[:n] for p, n in zip(outs, lengths)]
        packed = np.concatenate(parts)
        return (packed[..., 0], packed[..., 1], packed[..., 2:5],
                packed[..., 5:8])


def run_fused(cfg: dict, frames=None, save: bool = True,
              chunk_size: int = 4, work_long_side: int = 960,
              use_stm_tracking: bool = True) -> dict:
    """Driver-compatible bg-mode runner on the fused path (same artifacts
    as `pipeline/bg.py`: segmask_/bg_/alphamask_/fg_*.jpg at work res)."""
    import os
    import time

    from .common import read_frames, artifact_path
    from .. import runtime as native_runtime
    from ..utils.fileio import save_img

    data = cfg["data"]
    if save:
        os.makedirs(data["dst_img_dir"], exist_ok=True)
    st = time.time()
    frame_list = frames if frames is not None else read_frames(cfg)
    h, w, _ = frame_list[0].shape
    print(f"{len(frame_list)} frames. Reading Data Done! "
          f"{time.time() - st:.2f}s")

    pipe = FusedBgPipeline(cfg, (h, w), work_long_side=work_long_side,
                           use_stm_tracking=use_stm_tracking)
    st = time.time()
    alphas, segmasks, fgs, bgs = pipe.run(frame_list, chunk_size=chunk_size)
    elapsed = time.time() - st
    print(f"fused bg: {len(frame_list)} frames in {elapsed:.2f}s "
          f"({len(frame_list) / elapsed:.2f} fps)")

    if save:
        dst = data["dst_img_dir"]
        outputs = (("alphamask", np.repeat(alphas[..., None], 3, -1)),
                   ("segmask", np.repeat(segmasks[..., None], 3, -1)),
                   ("fg", fgs), ("bg", bgs))
        if native_runtime.available():
            for kind, imgs in outputs:
                paths = [artifact_path(dst, kind, i)
                         for i in range(len(frame_list))]
                native_runtime.encode_batch(paths,
                                            np.ascontiguousarray(imgs))
        else:
            for kind, imgs in outputs:
                for i in range(len(frame_list)):
                    save_img(artifact_path(dst, kind, i), imgs[i])
    return {"alphas": list(alphas), "numframes": len(frame_list),
            "fps": len(frame_list) / elapsed}
