"""Protocol artifacts for the last two BASELINE.json scenarios
(VERDICT r4 "Missing 5" — configs 3-4 had tests but no committed
protocol record):

  3. "STM mask propagation with iseg correction on a multi-shot clip"
  4. "person replacement (replace.sh): matting + harmonization +
     composite onto target video"

Scenario 3 builds a hard-cut multi-shot clip
(`parallel/data_synth.make_multishot_clip`), propagates the first-frame
GT mask with the trained STM, and compares raw propagation (which cannot
survive the cut — nothing matches across it) against the corrected
workflow: at each cut the mask is re-seeded by the trained ISeg agent
from simulated user clicks (positive at the GT centroid, negative at the
largest false-positive blob — the click protocol a human operator would
follow; reference workflow `unscreen/iseg/agent.py:92-119`). Both
variants are scored with the full MIOU/SAD/MSE/GRAD/CONN protocol
(`pipeline/evaluate.py`, reference `tools/eval.py:57-66`).

Scenario 4 runs the replace pipeline (`pipeline/replace.py`, reference
`tools/replace/replace.py:44-86`) on synthetic source/target clips with
known GT, then scores (a) the composite against the analytically
composited GT (PSNR/MSE — the compositing + shift/rescale geometry
path), and (b) with --harmonize, that toning moves the subject's Lab
mean toward the background (the harmonization contract,
`unscreen/harmonization/agent.py:39-76`).

  PYTHONPATH=.:$PYTHONPATH python tools/run_app_protocol.py \
      --results_dir ./results
"""
import argparse
import os
import os.path as osp

import numpy as np


def centroid(mask):
    ys, xs = np.nonzero(mask > 127)
    return int(ys.mean()), int(xs.mean())


def iseg_correct(iseg, frame, pred, gt):
    """Simulated operator correction: positive click at the subject
    (GT centroid), negative click at the worst false-positive blob of
    the failed propagation (if any)."""
    clicks = [(True, *centroid(gt))]
    fp = (pred > 127) & (gt <= 127)
    if fp.sum() > 20:
        clicks.append((False, *centroid(fp.astype(np.uint8) * 255)))
    return iseg.forward(frame, clicks)


def run_stm_iseg(results_dir):
    from video_unscreen_tpu.agents.iseg import ISegAgent
    from video_unscreen_tpu.agents.stm import STMAgent
    from video_unscreen_tpu.parallel.data_synth import make_multishot_clip
    from video_unscreen_tpu.pipeline.evaluate import evaluate_pair

    frames, gts, cuts = make_multishot_clip(n_shots=2, frames_per_shot=8)
    stm = STMAgent(model_path="weights/stm.msgpack", input_long_side=128,
                   memory_step=2, memory_capacity=10)
    iseg = ISegAgent(model_path="weights/iseg.msgpack",
                     input_long_side=128, with_flip=True)

    # raw propagation straight through the cut
    preds_raw = stm.forward(frames, gts[0])

    # corrected workflow: re-seed at every shot cut via iseg clicks
    preds_fix, bounds = [], [0] + list(cuts) + [len(frames)]
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        if b0 == 0:
            seed = gts[0]
        else:
            failed = preds_raw[b0]
            seed = iseg_correct(iseg, frames[b0], failed, gts[b0])
        preds_fix.extend(stm.forward(frames[b0:b1], seed))

    rows, lines = [], []
    for name, preds in (("stm_raw", preds_raw), ("stm_iseg", preds_fix)):
        scores = np.array([evaluate_pair(g.astype(np.uint8),
                                         p.astype(np.uint8))
                           for g, p in zip(gts, preds)])
        mean = scores.mean(axis=0)
        # the frames after the cut are where the two variants differ
        post = np.array([s for i, s in enumerate(scores)
                         if i >= cuts[0]]).mean(axis=0)
        rows.append((name, mean, post))
        lines.append(
            "{} MIOU: {:.06g} SAD: {:.06g} MSE: {:.06g} GRAD: {:.06g} "
            "CONN: {:.06g}' (post-cut MIOU {:.4f})".format(
                name, *mean, post[0]))
    with open(osp.join(results_dir, "test_stm_iseg.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    for ln in lines:
        print(ln)
    return rows


def run_replace(results_dir, tmp_root="/tmp/vu_replace_protocol"):
    import cv2
    from types import SimpleNamespace

    from video_unscreen_tpu.parallel.data_synth import make_eval_clip
    from video_unscreen_tpu.pipeline import replace as replace_mod

    n, h, w = 6, 144, 256
    src_frames, src_gts = make_eval_clip("natural", n=n, h=h, w=w, seed=7)
    tgt_frames, tgt_gts = make_eval_clip("natural", n=n, h=h, w=w, seed=19)

    src_dir = osp.join(tmp_root, "src")
    tgt_dir = osp.join(tmp_root, "tgt")
    for d in (src_dir, tgt_dir):
        os.makedirs(d, exist_ok=True)
    # GT-driven inputs: the replace tool consumes unscreen artifacts
    # (fg_/alphamask_ from a prior unscreen run); feeding GT isolates the
    # geometry + compositing + harmonization path this protocol scores
    for i in range(n):
        a = (src_gts[i].astype(np.float32) / 255.0)[..., None]
        cv2.imwrite(osp.join(src_dir, f"frame_{i:06d}.png"), src_frames[i])
        cv2.imwrite(osp.join(src_dir, f"alphamask_{i:06d}.png"),
                    np.repeat(src_gts[i][..., None], 3, -1))
        at = (tgt_gts[i].astype(np.float32) / 255.0)[..., None]
        tgt_fg = (tgt_frames[i].astype(np.float32) * at).astype(np.uint8)
        cv2.imwrite(osp.join(tgt_dir, f"fg_{i:06d}.png"), tgt_fg)
        cv2.imwrite(osp.join(tgt_dir, f"alphamask_{i:06d}.png"),
                    np.repeat(tgt_gts[i][..., None], 3, -1))
    # source background: the source clip rendered subject-free is not
    # available from make_eval_clip, so use the median-over-time of the
    # subject-excluded frames (every pixel is background in SOME frame)
    stack = np.stack(src_frames).astype(np.float32)
    occl = np.stack([g > 127 for g in src_gts])
    med = np.where(occl[..., None], np.nan, stack)
    bg = np.nanmedian(med, axis=0)
    bg = np.where(np.isnan(bg), stack.mean(axis=0), bg).astype(np.uint8)
    bg_path = osp.join(tmp_root, "bg_case.png")
    cv2.imwrite(bg_path, bg)

    out = {}
    for harmonize in (False, True):
        dst = osp.join(tmp_root, "dst_harm" if harmonize else "dst")
        args = SimpleNamespace(
            src="psrc", tgt="ptgt", src_data_dir=src_dir,
            tgt_data_dir=tgt_dir, src_bg_image=bg_path,
            dst_data_dir=dst, dst_vid_dir=osp.join(tmp_root, "video"),
            harmonize=harmonize)
        replace_mod.run(args)
        out[harmonize] = dst

    # score the plain composite against the analytic GT composite built
    # with the same measured shift (read back what the tool applied by
    # recomputing its centroid offset — `replace.py:28-41` semantics)
    dxdy = replace_mod.comp_dx_dy(src_dir, tgt_dir, num_imgs=n)
    dx, dy = float(dxdy[0]), float(dxdy[1])
    mses, psnrs = [], []
    for i in range(n):
        res = cv2.imread(osp.join(out[False], f"res_{i:06d}.jpg")
                         ).astype(np.float32)
        at = (tgt_gts[i].astype(np.float32) / 255.0)
        m = np.float32([[1, 0, dx], [0, 1, dy]])
        a_s = cv2.warpAffine(at, m, (w, h))
        fg_s = cv2.warpAffine(
            tgt_frames[i].astype(np.float32) * at[..., None], m, (w, h))
        gt_comp = fg_s + (1 - a_s[..., None]) * bg.astype(np.float32)
        mse = float(((res - gt_comp) ** 2).mean())
        mses.append(mse)
        psnrs.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-6)))
    lines = ["replace composite vs analytic GT composite: "
             "MSE {:.2f} PSNR {:.2f} dB (n={})".format(
                 np.mean(mses), np.mean(psnrs), n)]

    # harmonized variant: subject Lab-L mean moves toward the background
    import jax.numpy as jnp
    from video_unscreen_tpu.ops.color import bgr2lab
    plain = cv2.imread(osp.join(out[False], "res_000000.jpg"))
    harm = cv2.imread(osp.join(out[True], "res_000000.jpg"))
    at = (tgt_gts[0].astype(np.float32) / 255.0)
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    subj = cv2.warpAffine(at, m, (w, h)) > 0.5
    bg_l = float(np.asarray(
        bgr2lab(jnp.asarray(bg, jnp.float32)))[..., 0].mean())
    p_l = float(np.asarray(
        bgr2lab(jnp.asarray(plain, jnp.float32)))[subj][..., 0].mean())
    h_l = float(np.asarray(
        bgr2lab(jnp.asarray(harm, jnp.float32)))[subj][..., 0].mean())
    lines.append(
        "harmonize: subject L mean {:.1f} -> {:.1f} (bg {:.1f}; toning "
        "moved it {}closer)".format(
            p_l, h_l, bg_l,
            "" if abs(h_l - bg_l) <= abs(p_l - bg_l) else "NOT "))
    with open(osp.join(results_dir, "test_replace.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    for ln in lines:
        print(ln)
    return np.mean(mses), np.mean(psnrs)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--results_dir", type=str, default="./results")
    parser.add_argument("--scenarios", type=str, default="stm_iseg,replace")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    os.makedirs(args.results_dir, exist_ok=True)
    md = ["# Application-scenario protocol (BASELINE.json configs 3-4)",
          ""]
    scenarios = args.scenarios.split(",")
    if "stm_iseg" in scenarios:
        rows = run_stm_iseg(args.results_dir)
        md += ["## STM propagation + iseg correction (multi-shot clip)",
               "", "| variant | MIOU | SAD | MSE | GRAD | CONN | "
               "post-cut MIOU |", "|---|---|---|---|---|---|---|"]
        for name, mean, post in rows:
            md.append("| {} | {:.4f} | {:.3f} | {:.4f} | {:.3f} | "
                      "{:.3f} | {:.4f} |".format(name, *mean, post[0]))
        md.append("")
    if "replace" in scenarios:
        mse, psnr = run_replace(args.results_dir)
        md += ["## Person replacement (replace.sh path)",
               "",
               "| metric | value |", "|---|---|",
               "| composite MSE vs analytic GT | {:.2f} |".format(mse),
               "| composite PSNR | {:.2f} dB |".format(psnr),
               "", "Harmonization delta recorded in "
               "`results/test_replace.txt`.", ""]
    with open(osp.join(args.results_dir, "protocol_apps.md"), "w") as fh:
        fh.write("\n".join(md))
    print("wrote", osp.join(args.results_dir, "protocol_apps.md"))
