"""Generate the synthetic evaluation set (non-trivial clips).

Four clips — two green-screen, two natural-background — each a walking
articulated person with soft hair-wisp boundaries (4x supersampled
rendering), limb motion, gradient lighting, and textured backgrounds.
Layout matches the reference data contract (`tools/unscreen/green.py:
150-160`, `tools/eval.py:99-112`):

  <root>/src_img/<vid>/frame_%06d.jpg     pipeline input
  <root>/alpha_img/<vid>/frame_%06d.png   GT soft alphas (lossless)
  <root>/meta/vid_list.txt                all clips
  <root>/meta/vid_list_green.txt          green-mode clips
  <root>/meta/vid_list_natural.txt        bg-mode clips

  python tools/make_eval_set.py --data_root /tmp/unscreen_eval \
      --frames 12 --height 288 --width 512
"""
import argparse
import os
import os.path as osp

import cv2

from video_unscreen_tpu.parallel.data_synth import make_eval_clip

CLIPS = (
    ("green1", "green", 4, "plain"),
    ("green2", "green", 11, "plain"),
    ("natural1", "natural", 7, "plain"),
    ("natural2", "natural", 19, "plain"),
    # degradation variants (VERDICT round-2 item 5): motion blur, cast
    # shadow, JPEG artifacts, occluding prop, two people
    ("green_mblur", "green", 23, "motion_blur"),
    ("green_jpeg", "green", 31, "jpeg"),
    ("green_twop", "green", 37, "two_person"),
    ("natural_shadow", "natural", 29, "shadow"),
    ("natural_occl", "natural", 41, "occluder"),
    ("natural_twop", "natural", 43, "two_person"),
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="/tmp/unscreen_eval")
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--height", type=int, default=288)
    parser.add_argument("--width", type=int, default=512)
    args = parser.parse_args()

    root = args.data_root
    for vid, kind, seed, variant in CLIPS:
        frames, gts = make_eval_clip(kind, n=args.frames, h=args.height,
                                     w=args.width, seed=seed,
                                     variant=variant)
        src = osp.join(root, "src_img", vid)
        gtd = osp.join(root, "alpha_img", vid)
        os.makedirs(src, exist_ok=True)
        os.makedirs(gtd, exist_ok=True)
        for i, (f, g) in enumerate(zip(frames, gts)):
            cv2.imwrite(osp.join(src, f"frame_{i:06d}.jpg"), f,
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            cv2.imwrite(osp.join(gtd, f"frame_{i:06d}.png"), g)
        print(f"{vid}: {len(frames)} frames -> {src}")

    meta = osp.join(root, "meta")
    os.makedirs(meta, exist_ok=True)
    with open(osp.join(meta, "vid_list.txt"), "w") as fh:
        fh.write("\n".join(v for v, _, _, _ in CLIPS) + "\n")
    for kind in ("green", "natural"):
        with open(osp.join(meta, f"vid_list_{kind}.txt"), "w") as fh:
            fh.write("\n".join(v for v, k, _, _ in CLIPS if k == kind)
                     + "\n")
    print(f"eval set ready under {root}")
