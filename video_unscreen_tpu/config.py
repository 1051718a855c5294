"""Config loading — same JSON schema as the reference `configs/*.json`.

Top-level scalars (`fg_exist_thr`, `colorfiltering_update_duration`,
`colorfiltering_train_iters`, `bg_mask.*`, `objectremoval.*`) plus one
sub-dict per agent, kwargs-splatted into agent constructors
(`tools/unscreen/green.py:41-44`). The drivers add a `data` section; unlike
the reference (hardcoded roots, `green.py:150`) the root comes from
`--data_root` / `$UNSCREEN_DATA_ROOT`.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Optional


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def select_device(device_id: Optional[int] = None):
    """Pin this process's default JAX device from `UNSCREEN_DEVICE_ID`.

    The reference launcher exports `CUDA_VISIBLE_DEVICES` per worker
    (`tools/unscreen.sh:16-17`); `tools/unscreen.sh` here exports
    `UNSCREEN_DEVICE_ID` and `tools/unscreen_parallel.py` assigns video i
    to device i % workers — this is the consumer that makes that fan-out
    real on a multi-chip host. Returns the selected device (or None when
    unset/out of range, leaving JAX's default placement).
    """
    import jax

    # Honor $JAX_PLATFORMS explicitly: TPU plugin platforms (e.g. axon)
    # register themselves regardless of the env var, so a driver asked to
    # run on "cpu" would otherwise still claim the (single-client) TPU.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    if device_id is None:
        raw = os.environ.get("UNSCREEN_DEVICE_ID")
        if raw is None or not raw.strip().lstrip("-").isdigit():
            return None
        device_id = int(raw)
    devices = jax.devices()
    if not 0 <= device_id < len(devices):
        return None
    device = devices[device_id]
    jax.config.update("jax_default_device", device)
    return device


def default_data_root() -> str:
    return os.environ.get("UNSCREEN_DATA_ROOT", "./data")


def attach_data_section(cfg: dict, video_id: str, mode: str,
                        data_root: Optional[str] = None,
                        frame_range: Optional[str] = None,
                        src_tmpl: str = "*.*") -> dict:
    """Build cfg['data'] the way the reference drivers do
    (`tools/unscreen/green.py:150-160`)."""
    root = data_root or default_data_root()
    data = {
        "video_id": video_id,
        "range": ([int(i) for i in frame_range.split("-")]
                  if frame_range else None),
        "src_img_dir": osp.join(root, "src_img", video_id),
        "src_img_tmpl": src_tmpl,
        "dst_img_dir": osp.join(root, f"test_{mode}_img", video_id),
        "dst_vid_dir": osp.join(root, "video"),
    }
    cfg = dict(cfg)
    cfg["data"] = data
    return cfg
