"""Run the full evaluation protocol and emit the parity table.

Generates the synthetic eval set (if absent), runs each unscreen mode on
its clips, scores predictions against GT with the reference's
MIOU/SAD/MSE/GRAD/CONN protocol (`tools/eval.py:20-96`), and writes both
`results/<exp>.txt` artifacts and a combined markdown table to
`results/protocol.md` (committed into PARITY.md).

  PYTHONPATH=.:$PYTHONPATH python tools/run_eval_protocol.py \
      --data_root /tmp/unscreen_eval --modes green,bg,bg_step
"""
import argparse
import os
import os.path as osp
import subprocess
import sys
import time

from video_unscreen_tpu.config import attach_data_section, load_config
from video_unscreen_tpu.pipeline import run_eval


def ensure_eval_set(root, frames, height, width):
    if not osp.isdir(osp.join(root, "src_img")):
        subprocess.check_call(
            [sys.executable, "tools/make_eval_set.py", "--data_root", root,
             "--frames", str(frames), "--height", str(height),
             "--width", str(width)],
            env={**os.environ, "PYTHONPATH": ".:" +
                 os.environ.get("PYTHONPATH", "")})


def read_list(root, kind):
    with open(osp.join(root, "meta", f"vid_list_{kind}.txt")) as fh:
        return [ln.strip() for ln in fh if ln.strip()]


def run_mode(mode, root, vids, fused=True, work_long_side=288, chunk=4,
             wire="bgr"):
    cfg_fn = "./configs/green.json" if mode == "green" else "./configs/bg.json"
    base = load_config(cfg_fn)
    for vid in vids:
        cfg = attach_data_section(base, vid, mode, data_root=root,
                                  src_tmpl="*.jpg")
        st = time.time()
        if mode == "green":
            if fused:
                from video_unscreen_tpu.pipeline.fused_green import run_fused
                run_fused(cfg, chunk_size=chunk,
                          work_long_side=work_long_side, wire=wire)
            else:
                from video_unscreen_tpu.pipeline import run_green
                run_green(cfg)
        elif mode == "bg":
            if fused:
                from video_unscreen_tpu.pipeline.fused_bg import run_fused
                run_fused(cfg, chunk_size=chunk,
                          work_long_side=work_long_side, wire=wire)
            else:
                from video_unscreen_tpu.pipeline import run_bg
                run_bg(cfg)
        elif mode == "bg_step":
            from video_unscreen_tpu.pipeline import run_bg_offline
            run_bg_offline(cfg, fused=fused,
                           work_long_side=work_long_side,
                           chunk_size=chunk)
        print(f"[{mode}] {vid}: {time.time() - st:.1f}s")


def score_mode(mode, root, results_dir, suffix=""):
    kind = "green" if mode == "green" else "natural"
    cfg = {"data": {
        "range": None,
        "meta_fn": osp.join(root, "meta", f"vid_list_{kind}.txt"),
        "gt_data_dir": osp.join(root, "alpha_img"),
        "gt_data_tmpl": "*.*",
        "pred_data_dir": osp.join(root, f"test_{mode}_img"),
        "pred_data_tmpl": "alphamask_*.*",
        "save_data_fn": osp.join(results_dir, f"test_{mode}{suffix}.txt"),
    }}
    return run_eval(cfg)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="/tmp/unscreen_eval")
    parser.add_argument("--modes", type=str, default="green,bg,bg_step")
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--height", type=int, default=288)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--work_long_side", type=int, default=512)
    parser.add_argument("--modular", action="store_true",
                        help="use the modular (unfused) drivers")
    parser.add_argument("--wire", type=str, default="bgr",
                        choices=("bgr", "yuv420"),
                        help="host->device frame format for the fused "
                             "green/bg drivers (bg_step feeds device-"
                             "resident BGR; wire n/a) — yuv420 is the "
                             "bench/production wire, so running the "
                             "protocol with both records the chroma-"
                             "subsample quality delta")
    parser.add_argument("--suffix", type=str, default="",
                        help="appended to result filenames "
                             "(test_<mode><suffix>.txt, "
                             "protocol<suffix>.md) so runs at different "
                             "operating points coexist in results/")
    parser.add_argument("--results_dir", type=str, default="./results",
                        help="where the reference-format result txts and "
                             "the markdown table land (committed into "
                             "the repo — `tools/eval.py:53-54,111` "
                             "writes results/<exp>.txt)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    root = args.data_root
    ensure_eval_set(root, args.frames, args.height, args.width)
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    os.makedirs(args.results_dir, exist_ok=True)
    rows = {}
    for mode in modes:
        kind = "green" if mode == "green" else "natural"
        vids = read_list(root, kind)
        run_mode(mode, root, vids, fused=not args.modular,
                 work_long_side=args.work_long_side, wire=args.wire)
        rows[mode] = score_mode(mode, root, args.results_dir,
                                suffix=args.suffix)

    # combined markdown table (goes into PARITY.md)
    lines = ["| mode | clip | MIOU | SAD | MSE | GRAD | CONN |",
             "|---|---|---|---|---|---|---|"]
    for mode, per_video in rows.items():
        for vid, m in per_video.items():
            lines.append(
                f"| {mode} | {vid} | {m['miou']:.4f} | {m['sad']:.3f} | "
                f"{m['mse']:.4f} | {m['grad']:.3f} | {m['conn']:.3f} |")
    table = "\n".join(lines)
    with open(osp.join(args.results_dir,
                       f"protocol{args.suffix}.md"), "w") as fh:
        fh.write(table + "\n")
    print(table)
