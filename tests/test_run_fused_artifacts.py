"""run_fused: driver-compatible artifact emission via the native encoder."""
import glob
import os
import tempfile

import cv2
import numpy as np

from video_unscreen_tpu.pipeline.fused_green import run_fused
from tests.test_pipeline_green import TEST_CFG, make_clip


def test_run_fused_writes_artifacts():
    frames, _ = make_clip(n=4)
    out_dir = tempfile.mkdtemp(prefix="vu_fused_artifacts_")
    cfg = {**TEST_CFG, "data": {"dst_img_dir": out_dir, "range": None}}
    result = run_fused(cfg, frames=frames, save=True, chunk_size=2,
                       work_long_side=128)
    assert result["numframes"] == 4
    for kind in ("alphamask", "fg", "bg"):
        paths = sorted(glob.glob(os.path.join(out_dir, f"{kind}_*.jpg")))
        assert len(paths) == 4, kind
        img = cv2.imread(paths[0])
        assert img is not None and img.shape[2] == 3
    # alphamask jpgs decode to the alpha plane (within jpeg tolerance)
    a0 = cv2.imread(os.path.join(out_dir, "alphamask_000000.jpg"),
                    cv2.IMREAD_GRAYSCALE)
    assert np.abs(a0.astype(int) - result["alphas"][0].astype(int)
                  ).mean() < 8.0
