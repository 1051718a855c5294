"""Evaluation harness: MIOU / SAD / MSE / GRAD / CONN scoring.

TPU-native rebuild of `tools/eval.py`. The reference scores frames in a
24-process host pool (`eval.py:88`); here each GT/pred pair is scored in
one jitted device call (all five metrics fused), batched across a clip.
The report format and `results/<exp>.txt` artifact match the reference
(`eval.py:20-54`).
"""

from __future__ import annotations

import functools
import os.path as osp
from glob import glob
from typing import Dict, List, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import metrics as M
from ..utils.fileio import read_txt_list, write_txt_list


@functools.partial(jax.jit)
def _score_pair(gt: jax.Array, pred: jax.Array):
    return (M.miou(gt, pred), M.sad(gt, pred), M.mse(gt, pred),
            M.gradient_error(gt, pred), M.connectivity_error(gt, pred))


def evaluate_pair(gt_img: np.ndarray, pred_img: np.ndarray
                  ) -> Tuple[float, ...]:
    """Score one GT/pred alpha pair (`eval.py:57-66`)."""
    if pred_img.shape != gt_img.shape:
        pred_img = cv2.resize(pred_img, (gt_img.shape[1], gt_img.shape[0]))
    out = _score_pair(jnp.asarray(gt_img, jnp.float32),
                      jnp.asarray(pred_img, jnp.float32))
    return tuple(float(v) for v in out)


def evaluate_video(gt_paths: List[str], pred_paths: List[str]
                   ) -> Dict[str, List[float]]:
    results = {k: [] for k in ("miou", "sad", "mse", "grad", "conn")}
    for gt_path, pred_path in zip(gt_paths, pred_paths):
        gt = cv2.imread(gt_path, cv2.IMREAD_GRAYSCALE)
        pred = cv2.imread(pred_path, cv2.IMREAD_GRAYSCALE)
        miou, sad, mse, grad, conn = evaluate_pair(gt, pred)
        for k, v in zip(results, (miou, sad, mse, grad, conn)):
            results[k].append(v)
    return results


def _fmt(key: str, vals: Dict[str, float]) -> str:
    return ("{} MIOU: {:.06g} SAD: {:.06g} MSE: {:.06g} GRAD: {:.06g} "
            "CONN: {:.06g}'".format(key, vals["miou"], vals["sad"],
                                    vals["mse"], vals["grad"], vals["conn"]))


def run(cfg: dict) -> Dict[str, Dict[str, float]]:
    """Score every video in the meta list (`eval.py:70-96`)."""
    data = cfg["data"]
    vid_list = read_txt_list(data["meta_fn"])
    per_video: Dict[str, Dict[str, float]] = {}
    save_list = []
    print("-" * 50)
    for vid in vid_list:
        gt_paths = sorted(glob(osp.join(data["gt_data_dir"], vid,
                                        data["gt_data_tmpl"])))
        pred_paths = sorted(glob(osp.join(data["pred_data_dir"], vid,
                                          data["pred_data_tmpl"])))
        res = evaluate_video(gt_paths, pred_paths)
        per_video[vid] = {k: float(np.mean(v)) for k, v in res.items()}
        line = _fmt(vid, per_video[vid])
        print(line)
        save_list.append(line)
    print("-" * 50)
    overall = {k: float(np.mean([v[k] for v in per_video.values()]))
               for k in ("miou", "sad", "mse", "grad", "conn")}
    line = _fmt("ALL", overall)
    print(line)
    save_list.append(line)
    print("-" * 50)
    if data.get("save_data_fn"):
        import os
        os.makedirs(osp.dirname(data["save_data_fn"]), exist_ok=True)
        write_txt_list(data["save_data_fn"], save_list)
    per_video["ALL"] = overall
    return per_video
