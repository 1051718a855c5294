"""bg_step mode CLI — same surface as the reference
`tools/unscreen/bg_offline.py`, with explicit `--stages` instead of the
reference's `if 0/if 1` source edits."""
import argparse

from video_unscreen_tpu.config import (attach_data_section, load_config,
                                        select_device)
from video_unscreen_tpu.pipeline import run_bg_offline

if __name__ == "__main__":
    select_device()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default="./configs/bg.json")
    parser.add_argument("-vid", "--video_id", type=str, default="1")
    parser.add_argument("--range", type=str, default=None, help="eg. 400-700")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--stages", type=str, default="1,2,3",
                        help="comma-separated stage list, e.g. 2,3")
    parser.add_argument("--modular", action="store_true",
                        help="per-frame agent loop instead of the "
                             "compiled-scan fused stages")
    parser.add_argument("--chunk", type=int, default=4)
    args = parser.parse_args()

    cfg = load_config(args.cfg)
    cfg = attach_data_section(cfg, args.video_id, "bg_step",
                              data_root=args.data_root,
                              frame_range=args.range, src_tmpl="*.jpg")
    stages = tuple(int(s) for s in args.stages.split(","))
    run_bg_offline(cfg, stages=stages, fused=not args.modular,
                   chunk_size=args.chunk)
