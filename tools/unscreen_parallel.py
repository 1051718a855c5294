"""Multi-video fan-out.

The reference shells out one process per video with one GPU each
(`tools/unscreen_parallel.py:17-24`). TPU-native: still one process per
video id (modes are stateful across frames), but dispatched over a worker
pool so a v5e-8 host keeps all chips busy; `--workers N` maps video i to
device i % N via UNSCREEN_DEVICE_ID.
"""
import argparse
import os
import os.path as osp
import subprocess
from concurrent.futures import ThreadPoolExecutor

from video_unscreen_tpu.config import default_data_root
from video_unscreen_tpu.utils.fileio import read_txt_list

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--script", type=str, default="green")
    parser.add_argument("--range", type=str, default=None, help="eg. 0-40")
    parser.add_argument("--workers", type=int, default=1)
    parser.add_argument("--data_root", type=str, default=None)
    args = parser.parse_args()

    root = args.data_root or default_data_root()
    vid_list = read_txt_list(osp.join(root, "meta/vid_list.txt"))
    if args.range:
        start, end = args.range.split("-")
        vid_list = vid_list[int(start):int(end)]

    def launch(item):
        idx, vid = item
        dev = idx % max(args.workers, 1)
        return subprocess.call(
            ["bash", "tools/unscreen.sh", args.script, vid, str(dev)],
            env={**os.environ, "UNSCREEN_DATA_ROOT": root})

    with ThreadPoolExecutor(max_workers=max(args.workers, 1)) as pool:
        rets = list(pool.map(launch, enumerate(vid_list)))
    print(f"\nVideos Done: {len(vid_list)} ({sum(r == 0 for r in rets)} ok)")
