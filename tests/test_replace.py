"""Person-replacement pipeline e2e (`pipeline/replace.py`), including the
harmonized composite path (`unscreen/harmonization/agent.py:39-113` wired
per the "matting + harmonization + composite" recipe)."""
import os.path as osp
from types import SimpleNamespace

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from video_unscreen_tpu.agents.harmonization import HarmonizationAgent
from video_unscreen_tpu.ops.color import bgr2lab
from video_unscreen_tpu.pipeline import replace as replace_mod


def _write_clip(tmp_path, n=3, h=64, w=96):
    """Minimal on-disk replace layout: target fg/alphamask, source
    frames/masks, and a source bg image."""
    src_dir = tmp_path / "src"
    tgt_dir = tmp_path / "tgt"
    dst_dir = tmp_path / "dst"
    vid_dir = tmp_path / "video"
    src_dir.mkdir()
    tgt_dir.mkdir()
    rng = np.random.RandomState(0)

    # warm reddish subject over black, centered differently per clip
    for fid in range(n):
        mask = np.zeros((h, w), np.uint8)
        cv2.circle(mask, (w // 3, h // 2), h // 4, 255, -1)
        fg = np.zeros((h, w, 3), np.uint8)
        fg[mask > 0] = (40, 60, 200)  # BGR: red-ish
        cv2.imwrite(str(tgt_dir / f"fg_{fid:06d}.jpg"), fg)
        cv2.imwrite(str(tgt_dir / f"alphamask_{fid:06d}.jpg"),
                    np.repeat(mask[..., None], 3, -1))

        src_mask = np.zeros((h, w), np.uint8)
        cv2.circle(src_mask, (2 * w // 3, h // 2), h // 4, 255, -1)
        cv2.imwrite(str(src_dir / f"alphamask_{fid:06d}.jpg"),
                    np.repeat(src_mask[..., None], 3, -1))
        frame = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(src_dir / f"frame_{fid:06d}.jpg"), frame)

    # cool blue-ish background with high-frequency texture
    bg = np.zeros((h, w, 3), np.uint8)
    bg[...] = (200, 120, 30)
    bg += rng.randint(0, 40, (h, w, 3)).astype(np.uint8)
    bg_path = tmp_path / "bg_case.jpg"
    cv2.imwrite(str(bg_path), bg)

    return SimpleNamespace(
        src="tsrc", tgt="ttgt",
        src_data_dir=str(src_dir), tgt_data_dir=str(tgt_dir),
        src_bg_image=str(bg_path), dst_data_dir=str(dst_dir),
        dst_vid_dir=str(vid_dir), harmonize=False), bg


def test_replace_end_to_end(tmp_path):
    args, _ = _write_clip(tmp_path)
    replace_mod.run(args)
    res = cv2.imread(osp.join(args.dst_data_dir, "res_000000.jpg"))
    cmp_img = cv2.imread(osp.join(args.dst_data_dir, "compare_000000.jpg"))
    assert res is not None and cmp_img is not None
    assert cmp_img.shape[1] == 2 * res.shape[1]
    # the composite contains both subject (red-ish) and bg (blue-ish)
    assert (res[..., 2].astype(int) - res[..., 0].astype(int) > 60).any()
    assert (res[..., 0].astype(int) - res[..., 2].astype(int) > 60).any()


def test_replace_harmonized_tones_fg_toward_bg(tmp_path):
    """--harmonize must move the composited subject's Lab means toward the
    background's (foreground_toning contract, `agent.py:39-76`) and smooth
    the background (background_blurring)."""
    args, bg = _write_clip(tmp_path)
    replace_mod.run(args)
    plain = cv2.imread(osp.join(args.dst_data_dir, "res_000000.jpg"))

    args.harmonize = True
    args.dst_data_dir = str(tmp_path / "dst_harm")
    replace_mod.run(args)
    harm = cv2.imread(osp.join(args.dst_data_dir, "res_000000.jpg"))

    # subject region = strongly red pixels of the plain composite
    subject = (plain[..., 2].astype(int) - plain[..., 0].astype(int)) > 60
    assert subject.sum() > 50
    bg_lab = np.asarray(bgr2lab(jnp.asarray(bg, jnp.float32)))
    plain_lab = np.asarray(bgr2lab(jnp.asarray(plain, jnp.float32)))
    harm_lab = np.asarray(bgr2lab(jnp.asarray(harm, jnp.float32)))

    bg_mean = bg_lab.reshape(-1, 3).mean(0)
    plain_mean = plain_lab[subject].mean(0)
    harm_mean = harm_lab[subject].mean(0)
    # L channel is toned at ratio 0.5 — the strongest, most robust signal
    assert abs(harm_mean[0] - bg_mean[0]) < abs(plain_mean[0] - bg_mean[0])

    # background got blurred: high-frequency energy drops outside the fg
    bg_region = ~subject
    def hf_energy(img):
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
        return np.abs(cv2.Laplacian(g, cv2.CV_32F))[bg_region].mean()
    assert hf_energy(harm) < hf_energy(plain) * 0.9


def test_foreground_toning_shift_clamped():
    """Toning shift is clamped to [-30, 15] per channel
    (`agent.py:64-66`)."""
    agent = HarmonizationAgent()
    fg = np.zeros((32, 32, 3), np.uint8)          # black fg (L ~ 0)
    bg = np.full((32, 32, 3), 255, np.uint8)      # white bg (L ~ 255)
    alpha = np.full((32, 32), 255, np.uint8)
    toned = agent.foreground_toning(fg, bg, alpha)
    toned_lab = np.asarray(bgr2lab(jnp.asarray(toned, jnp.float32)))
    # unclamped shift would be ~127 in L; clamp caps it at +15
    assert toned_lab[..., 0].mean() <= 25.0
