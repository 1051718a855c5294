"""File I/O: image lists, parallel JPEG decode, video mux.

Rebuild of `unscreen/utils/fileio.py`: the 48-process decode pool
(`fileio.py:31-38`) becomes a thread pool (cv2 releases the GIL during
imdecode) feeding the host->HBM streaming queue in
`parallel/streaming.py`; video mux goes through cv2.VideoWriter instead of
mmcv/ffmpeg.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Sequence

import cv2
import numpy as np


def read_txt_list(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def write_txt_list(path: str, items: Sequence[str]) -> None:
    with open(path, "w") as f:
        for it in items:
            f.write(f"{it}\n")


def parallel_read_img(paths: Sequence[str], num_workers: int = 16,
                      flag=cv2.IMREAD_COLOR) -> List[np.ndarray]:
    """Decode images concurrently.

    JPEG batches go through the native C++ runtime (threaded libjpeg,
    `runtime/loader.cpp`) when available — frames in a clip share one
    geometry, matching the reference's usage. Everything else falls back
    to a cv2 thread pool (cv2 drops the GIL during imdecode).
    """
    paths = list(paths)
    if flag == cv2.IMREAD_COLOR and paths and all(
            p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        from .. import runtime
        if runtime.available():
            out = runtime.decode_batch(paths, threads=num_workers)
            if out is not None:
                return list(out)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        return list(pool.map(lambda p: cv2.imread(p, flag), paths))


def save_img(path: str, img: np.ndarray, long_side: int = -1) -> None:
    """Write an image, optionally downscaling its long side first
    (`fileio.py:50-62`)."""
    if long_side > 0:
        h, w = img.shape[:2]
        if max(h, w) > long_side:
            if h > w:
                img = cv2.resize(img, (int(w * long_side / h), long_side))
            else:
                img = cv2.resize(img, (long_side, int(h * long_side / w)))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, img)


def save_video(frame_dir: str, video_path: str, fps: float = 25.0,
               filename_tmpl: str = "{:06d}.jpg") -> None:
    """Assemble frames into a video (`fileio.py:41-47` used
    mmcv.frames2video)."""
    frames = sorted(os.listdir(frame_dir))
    frames = [f for f in frames if f.endswith((".jpg", ".png"))]
    if not frames:
        raise ValueError(f"no frames in {frame_dir}")
    first = cv2.imread(os.path.join(frame_dir, frames[0]))
    h, w = first.shape[:2]
    os.makedirs(os.path.dirname(video_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(video_path,
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for name in frames:
        writer.write(cv2.imread(os.path.join(frame_dir, name)))
    writer.release()
