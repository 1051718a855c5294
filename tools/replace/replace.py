"""Person replacement CLI — same surface as the reference
`tools/replace/replace.py:89-102` with a `--data_root` override."""
import argparse
import os.path as osp

from video_unscreen_tpu.config import select_device
from video_unscreen_tpu.pipeline import run_replace

if __name__ == "__main__":
    select_device()
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, default="test5")
    parser.add_argument("--tgt", type=str, default=None)
    parser.add_argument("--data_root", type=str,
                        default="./data/replace/edn")
    parser.add_argument("--harmonize", action="store_true",
                        help="apply foreground Lab toning + background "
                             "blurring before the composite")
    args = parser.parse_args()

    data_root = args.data_root
    args.tgt = args.tgt or ("out" + args.src[-1])
    args.src_img_dir = osp.join(data_root, "src_img", args.src + "_500")
    args.src_data_dir = osp.join(data_root, "unscreen_img", args.src)
    args.src_bg_image = osp.join(args.src_data_dir, "../bg/bg_case.jpg")
    args.tgt_data_dir = osp.join(data_root, "unscreenbg_img", args.tgt)
    args.dst_data_dir = osp.join(data_root, "merge_test_img",
                                 f"{args.src}_{args.tgt}")
    args.dst_vid_dir = osp.join(data_root, "video")
    run_replace(args)
