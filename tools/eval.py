"""Metric harness CLI — same protocol as the reference `tools/eval.py`."""
import argparse
import os.path as osp

from video_unscreen_tpu.config import default_data_root
from video_unscreen_tpu.pipeline import run_eval

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--exp_name", type=str, default="test_green")
    args = parser.parse_args()

    data_root = args.data_root or default_data_root()
    cfg = {"data": {
        "range": None,
        "meta_fn": osp.join(data_root, "meta/vid_list2.txt"),
        "gt_data_dir": osp.join(data_root, "alpha_img"),
        "gt_data_tmpl": "*.*",
        "pred_data_dir": osp.join(data_root, f"{args.exp_name}_img"),
        "pred_data_tmpl": "alphamask_*.*",
        "save_data_fn": osp.join(data_root, f"results/{args.exp_name}.txt"),
    }}
    run_eval(cfg)
