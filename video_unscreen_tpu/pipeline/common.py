"""Shared pipeline helpers: config-driven object removal, artifact store."""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.connected import remove_invalid_objects, score_map
from ..utils.fileio import parallel_read_img

_SCORE_MAP_CACHE = {}


def build_score_map(h: int, w: int, cfg: dict) -> np.ndarray:
    """Landscape/portrait score map from config
    (`unscreen/utils/maskprocess.py:181-189`), cached per geometry."""
    centers = cfg["objectremoval"]["score_map_center"]
    center = tuple(centers["landscape"] if w > h else centers["portrait"])
    key = (h, w, center)
    if key not in _SCORE_MAP_CACHE:
        _SCORE_MAP_CACHE[key] = score_map(h, w, center)
    return _SCORE_MAP_CACHE[key]


def remove_invalid_objects_cfg(cfg: dict, alpha: np.ndarray,
                               segmask: Optional[np.ndarray] = None
                               ) -> np.ndarray:
    """Config-threshold object removal (`maskprocess.py:77-152`: segmask
    defaults to the alpha itself)."""
    if segmask is None:
        segmask = alpha
    h, w = alpha.shape
    sm = build_score_map(h, w, cfg)
    out = remove_invalid_objects(
        jnp.asarray(alpha, jnp.float32), jnp.asarray(segmask, jnp.float32),
        jnp.asarray(sm),
        saliency_thr=float(cfg["objectremoval"]["saliency_thr"]),
        consensus_thr=float(cfg["objectremoval"]["consensus_thr"]))
    return np.asarray(out).astype(np.uint8)


def read_frames(cfg: dict) -> List[np.ndarray]:
    """Load the clip per cfg['data'] (`tools/unscreen/green.py:50-53`)."""
    data = cfg["data"]
    paths = sorted(glob(osp.join(data["src_img_dir"], data["src_img_tmpl"])))
    if data.get("range"):
        paths = paths[data["range"][0]:data["range"][1]]
    if not paths:
        raise FileNotFoundError(
            f"no frames matching {data['src_img_tmpl']} in "
            f"{data['src_img_dir']}")
    return parallel_read_img(paths)


def exist_foreground_np(mask: np.ndarray, thr: float) -> bool:
    """Host-side foreground gate (`maskprocess.py:56-60`)."""
    h, w = mask.shape
    return (mask >= 128).sum() > thr * h * w


def artifact_path(dst_dir: str, kind: str, fid: int) -> str:
    return osp.join(dst_dir, f"{kind}_{fid:06d}.jpg")


def print_statistic(runtime: dict, tracking_count: int,
                    numframes: int) -> None:
    """Per-stage runtime report (`tools/unscreen/green.py:21-28`)."""
    print(f"{tracking_count} / {numframes} use tracking")
    print("-" * 10 + "runtime" + "-" * 10)
    for key, value in runtime.items():
        print(f"{key:>16s}: {value / max(numframes, 1):.3f}s")
    print("-" * 10 + "-------" + "-" * 10)
    print()
