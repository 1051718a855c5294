"""bg mode — online background-estimation unscreen.

TPU-native rebuild of `tools/unscreen/bg.py`: per frame, human-seg (or STM
tracking) -> matting pass 1 -> per-frame background via regionfill ->
background-difference mask -> matting pass 2 -> foreground. Artifacts:
`segmask_/bg_/alphamask_/fg_*.jpg`.
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from ..agents import STMAgent, TrimapAgent, VMattingAgent
from ..agents.binseg import build_seg_agent
from ..ops import color as colorops
from ..ops import morphology as morph
from ..ops.compositing import get_bg, get_fg
from ..ops.regionfill import regionfill
from ..utils.fileio import save_img
from .common import (artifact_path, exist_foreground_np, read_frames,
                     remove_invalid_objects_cfg)

# Config keys in the `stm` section consumed only by the fused pipeline
# (`pipeline/fused_bg.py`); STMAgent's constructor (the reference surface,
# `unscreen/stm/agent.py:20-56`) does not accept them, so the modular
# drivers pop them before splatting (ADVICE round-4 high).
FUSED_ONLY_STM_KEYS = ("fused_bank_capacity", "balloon_ratio")


def build_bg_agents(cfg: dict):
    """Construct the modular bg-mode agent set from a config dict —
    shared by `pipeline/bg.py` and `pipeline/bg_offline.py` so the
    shipped `configs/bg.json` (which carries fused-only stm keys)
    drives both without TypeError."""
    seg_cfg = dict(cfg["binseg"])
    seg_cfg.setdefault("type", "human")  # reference bg.py uses HumanSegAgent
    stm_kw = {k: v for k, v in cfg["stm"].items()
              if k not in FUSED_ONLY_STM_KEYS}
    return (build_seg_agent(seg_cfg), STMAgent(**stm_kw),
            TrimapAgent(**cfg["trimap"]), VMattingAgent(**cfg["vmatting"]))


def _per_frame_background(frame: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """bg = (1-a)*frame, then regionfill each BGR channel behind the
    dilated binarized alpha (`tools/unscreen/bg.py:71-83`)."""
    bg = get_bg(jnp.asarray(alpha, jnp.float32),
                jnp.asarray(frame, jnp.float32))
    alpha_bin = jnp.where(jnp.asarray(alpha, jnp.float32) > 128, 255.0, 0.0)
    alpha_bin = morph.dilate(alpha_bin, 3, 2)
    channels = [regionfill(bg[..., c], alpha_bin) for c in range(3)]
    bgimg = jnp.stack(channels, axis=-1)
    return np.asarray(bgimg).clip(0, 255).astype(np.uint8)


def run(cfg: dict, frames=None, save: bool = True) -> dict:
    data = cfg["data"]
    if save:
        os.makedirs(data["dst_img_dir"], exist_ok=True)

    st = time.time()
    frame_list = frames if frames is not None else read_frames(cfg)
    h, w, _ = frame_list[0].shape
    numframes = len(frame_list)
    print(f"{numframes} frames. Reading Data Done! {time.time() - st:.2f}s")

    segagent, stmagent, trimapagent, vmatagent = build_bg_agents(cfg)
    print(f"Agent built in {time.time() - st:.2f}s")

    tracking_flag = False
    alpha_pre = np.zeros((h, w), np.uint8)
    alphas = []

    for fid in range(numframes):
        frame = frame_list[fid]
        # segmentation: STM tracking from the previous alpha, else human-seg
        # (`bg.py:49-56`)
        if tracking_flag and fid > 0:
            segmask = alpha_pre.copy()
            segmask[segmask >= 128] = 255
            segmask = stmagent.forward(frame_list[fid - 1:fid + 1],
                                       segmask)[-1]
        else:
            segmask = segagent.forward(frame)
        if save:
            save_img(artifact_path(data["dst_img_dir"], "segmask", fid),
                     segmask)

        if not exist_foreground_np(segmask, cfg["fg_exist_thr"]):
            fg = np.zeros_like(frame)
            alpha = np.zeros_like(segmask)
        else:
            # matting pass 1 (`bg.py:67-70`)
            alphaor = remove_invalid_objects_cfg(cfg, segmask)
            trimap = trimapagent.forward(alphaor)
            alpha = vmatagent.forward(frame, alpha_pre, trimap)

            # per-frame background (`bg.py:71-83`)
            bgimg = _per_frame_background(frame, alpha)
            if save:
                save_img(artifact_path(data["dst_img_dir"], "bg", fid), bgimg)

            # background-difference mask (`bg.py:85-89`)
            diff = np.abs(frame.astype(np.float32)
                          - bgimg.astype(np.float32))
            alphabg = np.asarray(colorops.bgr2gray(
                jnp.asarray(diff))).astype(np.float32)
            alphabg[alphabg > cfg["bg_mask"]["thr"]] = 255
            alphabg = np.asarray(morph.dilate(
                jnp.asarray(alphabg.clip(0, 255)), 4, 2))

            # matting pass 2 on alpha * bgmask (`bg.py:92-95`)
            alpha_ensm = (alpha.astype(np.float32)
                          * (alphabg.astype(np.uint8) // 255)).astype(
                              np.uint8)
            alphaor = remove_invalid_objects_cfg(cfg, alpha_ensm)
            trimap = trimapagent.forward(alphaor)
            alpha = vmatagent.forward(frame, alpha_pre, trimap)
            if save:
                save_img(artifact_path(data["dst_img_dir"], "alphamask", fid),
                         alpha)

            # foreground (`bg.py:99-102`)
            bgimg = bgimg.copy()
            bgimg[alpha == 0] = frame[alpha == 0]
            fg = np.asarray(get_fg(
                jnp.asarray(frame, jnp.float32),
                jnp.asarray(alpha, jnp.float32),
                jnp.asarray(bgimg, jnp.float32))).clip(0, 255).astype(
                    np.uint8)
            if save:
                save_img(artifact_path(data["dst_img_dir"], "fg", fid), fg)

        alphas.append(alpha)
        alpha_pre = alpha.copy()
        tracking_flag = exist_foreground_np(alpha, cfg["fg_exist_thr"])

    return {"alphas": alphas, "numframes": numframes}
