"""Person replacement — composite a matted person onto another video's bg.

TPU-native rebuild of `tools/replace/replace.py`: mean mask-centroid
offset between source and target clips, shift + rescale of the target
fg/mask, alpha composite onto the source background, `res_/compare_*`
artifacts and a comparison video. The per-frame shift/rescale/composite is
one jitted device program; centroids are masked moment sums on device.

With `--harmonize`, the HarmonizationAgent runs before the composite —
foreground Lab toning toward the background plus background blurring
(`unscreen/harmonization/agent.py:39-113`), the "matting + harmonization
+ composite" person-replacement recipe. All stages stay device-resident
between the jitted calls.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
from glob import glob
from typing import Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import resize
from ..utils.fileio import save_video


@jax.jit
def mask_centroid(mask_gray: jax.Array) -> jax.Array:
    """Centroid (cx, cy) of a grayscale mask via image moments
    (`unscreen/utils/imgprocess.py:7-14`)."""
    h, w = mask_gray.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    m00 = mask_gray.sum() + 1e-6
    return jnp.stack([(mask_gray * xs).sum() / m00,
                      (mask_gray * ys).sum() / m00])


@functools.partial(jax.jit, static_argnums=(4,))
def _compose(fg: jax.Array, mask: jax.Array, bg: jax.Array,
             shift_xy: jax.Array, scale_factor: float) -> jax.Array:
    """shift_fg + rescale_fg + alpha composite (`replace.py:69-76`)."""
    h, w = fg.shape[:2]

    def shift_and_scale(img):
        # translate by (dx, dy), zero-fill (cv2.warpAffine semantics)
        dx, dy = shift_xy[0], shift_xy[1]
        ys = jnp.arange(h, dtype=jnp.float32)[:, None] - dy
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] - dx
        gy = jnp.broadcast_to(ys, (h, w))
        gx = jnp.broadcast_to(xs, (h, w))

        def warp_plane(p):
            return jax.scipy.ndimage.map_coordinates(
                p, [gy, gx], order=1, mode="constant", cval=0.0)

        shifted = jnp.stack([warp_plane(img[..., c])
                             for c in range(img.shape[-1])], -1)
        # center-crop rescale (`imgprocess.py:40-52`)
        sh, sw = int(h * scale_factor), int(w * scale_factor)
        big = resize(shifted, (sh, sw))
        off_h, off_w = (sh - h) // 2, (sw - w) // 2
        return jax.lax.dynamic_slice(big, (off_h, off_w, 0),
                                     (h, w, img.shape[-1]))

    fg_s = shift_and_scale(fg)
    mask_s = shift_and_scale(mask)
    a = mask_s / 255.0
    return jnp.clip(fg_s * a + bg * (1.0 - a), 0.0, 255.0)


def comp_dx_dy(src_data_dir: str, tgt_data_dir: str,
               numframes: int) -> Tuple[float, float]:
    """Mean centroid offset src<-tgt over the clip (`replace.py:28-41`)."""
    dxs, dys = [], []
    for fid in range(numframes):
        dst_mask = cv2.imread(
            osp.join(tgt_data_dir, f"alphamask_{fid:06d}.jpg"))
        src_mask = cv2.imread(
            osp.join(src_data_dir, f"alphamask_{fid:06d}.jpg"))
        src_mask = cv2.resize(src_mask,
                              (dst_mask.shape[1], dst_mask.shape[0]))
        dc = np.asarray(mask_centroid(jnp.asarray(
            cv2.cvtColor(dst_mask, cv2.COLOR_BGR2GRAY), jnp.float32)))
        sc = np.asarray(mask_centroid(jnp.asarray(
            cv2.cvtColor(src_mask, cv2.COLOR_BGR2GRAY), jnp.float32)))
        dxs.append(sc[0] - dc[0])
        dys.append(sc[1] - dc[1])
    return float(np.mean(dxs)), float(np.mean(dys))


def run(args) -> None:
    """args: namespace with src/tgt dirs as in `replace.py:89-102`."""
    framepaths = sorted(glob(osp.join(args.tgt_data_dir, "fg_*.jpg")))
    numframes = len(framepaths)
    assert numframes > 0
    os.makedirs(args.dst_data_dir, exist_ok=True)

    dx, dy = comp_dx_dy(args.src_data_dir, args.tgt_data_dir, numframes)
    print("Correspondence mean: ", dx, dy)
    shift = jnp.asarray([dx, dy], jnp.float32)

    harmonize = bool(getattr(args, "harmonize", False))
    if harmonize:
        from ..agents.harmonization import HarmonizationAgent
        harm = HarmonizationAgent()

    src_bg = cv2.imread(args.src_bg_image)
    for fid in range(numframes):
        dst_fg = cv2.imread(osp.join(args.tgt_data_dir,
                                     f"fg_{fid:06d}.jpg"))
        dst_mask = cv2.imread(osp.join(args.tgt_data_dir,
                                       f"alphamask_{fid:06d}.jpg"))
        src_image = cv2.imread(osp.join(args.src_data_dir,
                                        f"frame_{fid:06d}.jpg"))
        hw = (dst_fg.shape[1], dst_fg.shape[0])
        src_image = cv2.resize(src_image, hw) if src_image is not None \
            else np.zeros_like(dst_fg)
        bg = cv2.resize(src_bg, hw)

        fg_d = jnp.asarray(dst_fg, jnp.float32)
        bg_d = jnp.asarray(bg, jnp.float32)
        if harmonize:
            alpha_gray = jnp.asarray(
                cv2.cvtColor(dst_mask, cv2.COLOR_BGR2GRAY), jnp.float32)
            fg_d = harm.device_foreground_toning(fg_d, bg_d, alpha_gray)
            work = tuple(harm.blur_work_hw(bg.shape[0], bg.shape[1]))
            bg_d = harm.device_smooth(bg_d, 3, 3, work)
        res = _compose(fg_d, jnp.asarray(dst_mask, jnp.float32),
                       bg_d, shift, 1.2)
        res = np.asarray(res).astype(np.uint8)
        cv2.imwrite(osp.join(args.dst_data_dir, f"res_{fid:06d}.jpg"), res)
        cv2.imwrite(osp.join(args.dst_data_dir, f"compare_{fid:06d}.jpg"),
                    np.concatenate((src_image, res), axis=1))

    try:
        save_video(args.dst_data_dir,
                   osp.join(args.dst_vid_dir,
                            f"compare_{args.src}_{args.tgt}.mp4"))
    except Exception as e:
        print(f"save_video skipped: {e}")
