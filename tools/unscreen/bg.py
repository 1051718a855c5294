"""bg mode CLI — same surface as the reference `tools/unscreen/bg.py`."""
import argparse

from video_unscreen_tpu.config import (attach_data_section, load_config,
                                        select_device)
from video_unscreen_tpu.pipeline import run_bg

if __name__ == "__main__":
    select_device()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default="./configs/bg.json")
    parser.add_argument("-vid", "--video_id", type=str, default="1")
    parser.add_argument("--range", type=str, default=None, help="eg. 400-700")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--fused", action="store_true",
                        help="run the compiled single-program pipeline")
    parser.add_argument("--chunk", type=int, default=4)
    parser.add_argument("--segments", type=int, default=1,
                        help="batch N independent clip segments through "
                             "one compiled scan (fused path; carries "
                             "reset at segment boundaries)")
    parser.add_argument("--wire", type=str, default="bgr",
                        choices=("bgr", "yuv420"),
                        help="host->device frame format; yuv420 ships "
                             "1.5 B/px I420 (lossy 4:2:0) for "
                             "bandwidth-limited links")
    parser.add_argument("--profile", action="store_true",
                        help="per-stage runtime report (device vs "
                             "host/wire time); set $VU_TRACE_DIR for a "
                             "JAX profiler trace")
    args = parser.parse_args()

    cfg = load_config(args.cfg)
    cfg = attach_data_section(cfg, args.video_id, "bg",
                              data_root=args.data_root,
                              frame_range=args.range, src_tmpl="*.jpg")
    if args.fused:
        from video_unscreen_tpu.pipeline.fused_bg import run_fused
        run_fused(cfg, chunk_size=args.chunk, segments=args.segments,
                  wire=args.wire, profile=args.profile)
    else:
        run_bg(cfg)
