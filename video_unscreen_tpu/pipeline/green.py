"""Green mode — chroma-key unscreen pipeline.

TPU-native rebuild of `tools/unscreen/green.py`: per frame,
segmentation (or tracking shortcut) -> color filtering (GMM) -> invalid
object removal -> trimap + matting -> color correction -> foreground
un-blend, emitting `alphamask_/fg_/bg_*.jpg` artifacts. The stage
structure, gating logic (tracking flag, cf_iters schedule), and artifact
layout mirror the reference exactly; every pixel op runs on device.
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..agents import ColorFilteringAgent, TrimapAgent, VMattingAgent
from ..agents.binseg import build_seg_agent
from ..ops.compositing import color_correct, get_fg
from ..utils.fileio import save_img
from .common import (artifact_path, exist_foreground_np, print_statistic,
                     read_frames, remove_invalid_objects_cfg)
import jax.numpy as jnp


def run(cfg: dict, frames=None, save: bool = True) -> dict:
    """Run green-mode unscreen. Returns a results dict with per-frame
    alphas (for tests/eval) and the runtime report."""
    data = cfg["data"]
    if save:
        os.makedirs(data["dst_img_dir"], exist_ok=True)

    st = time.time()
    segagent = build_seg_agent(cfg["binseg"])
    trimapagent = TrimapAgent(**cfg["trimap"])
    vmatagent = VMattingAgent(**cfg["vmatting"])
    cfagent = ColorFilteringAgent(**cfg["colorfiltering"])
    print(f"Building Agents Done! {time.time() - st:.2f}s")

    st = time.time()
    frame_list = frames if frames is not None else read_frames(cfg)
    numframes = len(frame_list)
    h, w, _ = frame_list[0].shape
    print(f"{numframes} frames. Reading Data Done! {time.time() - st:.2f}s")

    tracking_count = 0
    runtime = {k: 0.0 for k in ("seg", "color_filter", "object_removal",
                                "matting", "color_correct", "getfg")}
    cfagent.reset_gmms()
    tracking_flag = False
    alpha_pre = np.zeros((h, w), np.uint8)
    alphas = []

    for fid in range(numframes):
        frame = frame_list[fid]
        # 1. segmentation (or tracking shortcut, `green.py:74-77`)
        st = time.time()
        if tracking_flag:
            segmask = alpha_pre.copy()
            tracking_count += 1
        else:
            segmask = segagent.forward(frame)
        runtime["seg"] += time.time() - st

        if not exist_foreground_np(segmask, cfg["fg_exist_thr"]):
            alpha = np.zeros_like(segmask)
            fg = np.zeros_like(frame)
            bgimg = frame
        else:
            # cf_iters schedule (`green.py:88-96`)
            if fid % cfg["colorfiltering_update_duration"] == 0:
                cf_iters = cfg["colorfiltering_train_iters"]
            elif not tracking_flag:
                cf_iters = cfg["colorfiltering_train_iters"]
            elif not cfagent.is_trained():
                cf_iters = cfg["colorfiltering_train_iters"]
            else:
                cf_iters = 0

            # 2. color filtering
            st = time.time()
            alphacf, bgimg, _ = cfagent.forward(frame, segmask,
                                                iters=cf_iters)
            bg_color = bgimg[0, 0]
            runtime["color_filter"] += time.time() - st

            # 3. invalid object removal
            st = time.time()
            if tracking_flag:
                alphaor = remove_invalid_objects_cfg(cfg, alphacf)
            else:
                alphaor = remove_invalid_objects_cfg(cfg, alphacf, segmask)
            runtime["object_removal"] += time.time() - st

            # 4. trimap + matting
            st = time.time()
            trimap = trimapagent.forward(alphaor, frame, bg_color)
            alpha = vmatagent.forward(frame, alpha_pre, trimap)
            runtime["matting"] += time.time() - st

            # 5. color correction
            st = time.time()
            alpha = np.asarray(color_correct(
                jnp.asarray(frame, jnp.float32),
                jnp.asarray(alpha, jnp.float32),
                jnp.asarray(bg_color, jnp.float32))).clip(0, 255).astype(
                    np.uint8)
            runtime["color_correct"] += time.time() - st

            # 6. foreground un-blend (`green.py:125-126`)
            st = time.time()
            bgimg = bgimg.copy()
            bgimg[alpha < 128] = frame[alpha < 128]
            fg = np.asarray(get_fg(
                jnp.asarray(frame, jnp.float32),
                jnp.asarray(alpha, jnp.float32),
                jnp.asarray(bgimg, jnp.float32))).clip(0, 255).astype(
                    np.uint8)
            runtime["getfg"] += time.time() - st

        if save:
            save_img(artifact_path(data["dst_img_dir"], "fg", fid), fg)
            save_img(artifact_path(data["dst_img_dir"], "alphamask", fid),
                     alpha)
            save_img(artifact_path(data["dst_img_dir"], "bg", fid), bgimg)
        alphas.append(alpha)

        tracking_flag = exist_foreground_np(alpha, cfg["fg_exist_thr"])
        alpha_pre = alpha.copy()

    print_statistic(runtime, tracking_count, numframes)
    return {"alphas": alphas, "runtime": runtime,
            "tracking_count": tracking_count, "numframes": numframes}
