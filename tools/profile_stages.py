"""Per-op device-time microbench at the bench geometry (960x544 work res).

Times the always-on non-MXU stages standalone (median of repeats, device
blocked) so kernel work targets the measured budget, not guesses:

  PYTHONPATH=.:$PYTHONPATH python tools/profile_stages.py [--ops flood,...]
"""
import argparse
import time

import numpy as np


def bench_op(fn, *args, repeats=20, warm=2, iters=16):
    """Median per-application device time of `fn(*args)`.

    The op is applied `iters` times inside ONE jitted fori_loop (a data-
    dependent chain on the first argument), so the tunneled dispatch
    latency (~25 ms/call on this host) is amortized away and the number
    read is device compute. `fn` must map its first arg to a same-shaped
    array."""
    import jax
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def many(x, *rest):
        def body(i, a):
            return fn(a, *rest).astype(a.dtype).reshape(a.shape)
        return jax.lax.fori_loop(0, iters, body, x)

    for _ in range(warm):
        out = many(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(repeats):
        st = time.time()
        out = many(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - st)
    return sorted(ts)[len(ts) // 2] / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hw", type=str, default="544,960")
    parser.add_argument("--ops", type=str, default="all")
    parser.add_argument("--repeats", type=int, default=20)
    parser.add_argument("--models", action="store_true",
                        help="also bench the bg-mode model stages "
                             "(matting UNet, STM track, SCHP seed, "
                             "3-channel regionfill cold/warm) — needs "
                             "weights/")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import functools

    h, w = (int(v) for v in args.hw.split(","))
    rng = np.random.RandomState(0)

    # a realistic matte: a few blobs + speckle noise
    yy, xx = np.mgrid[0:h, 0:w]
    alpha = np.zeros((h, w), np.float32)
    alpha[((yy - h // 2) ** 2 / (h * 0.3) ** 2
           + (xx - w // 3) ** 2 / (w * 0.15) ** 2) < 1.0] = 255.0
    alpha[((yy - h // 4) ** 2 / 900 + (xx - 2 * w // 3) ** 2 / 400) < 1.0] \
        = 255.0
    speck = rng.rand(h, w) < 0.001
    alpha[speck] = 255.0
    frame = rng.rand(h, w, 3).astype(np.float32) * 255.0

    from video_unscreen_tpu.ops.connected import (
        connected_components, remove_invalid_objects,
        remove_invalid_objects_ds, score_map)
    from video_unscreen_tpu.ops import morphology as morph
    from video_unscreen_tpu.ops.trimap import (generate_trimap,
                                               generate_trimap_withbg)
    from video_unscreen_tpu.ops.regionfill import regionfill

    alpha_j = jnp.asarray(alpha)
    frame_j = jnp.asarray(frame)
    score = jnp.asarray(score_map(h, w))
    ds = 2
    lh, lw = h // ds, w // ds
    alpha_lr = jnp.asarray(alpha[::ds, ::ds])
    score_lr = jnp.asarray(np.asarray(score)[::ds, ::ds])
    bg_color = jnp.asarray([40.0, 190.0, 50.0])

    sel = args.ops.split(",") if args.ops != "all" else None
    out = {}

    def run(name, fn, *a):
        if sel and name not in sel:
            return
        out[name] = bench_op(fn, *a, repeats=args.repeats) * 1e3

    # flood alone at ds res (the labeling inside remove_invalid_ds)
    run("cc_flood_ds", lambda a: connected_components(a), alpha_lr)
    # stats alone: jit the stats portion given precomputed labels
    lbl = connected_components(alpha_lr)

    def stats_only(lbl, alpha, segmask, score):
        hh, ww = alpha.shape
        flat = lbl.reshape(-1)
        n = hh * ww + 1
        ones = (flat > 0).astype(jnp.float32)
        area = jnp.zeros(n, jnp.float32).at[flat].add(ones)
        sal = jnp.zeros(n, jnp.float32).at[flat].add(
            score.reshape(-1) * ones)
        cons = jnp.zeros(n, jnp.float32).at[flat].add(
            (segmask.reshape(-1) / 255.0) * ones)
        saliency = sal / float(hh * ww)
        consensus = cons / jnp.maximum(area, 1.0)
        valid = (area >= 25) & (
            ((saliency > 0.005) & (consensus > 0.5))
            | (saliency > 0.05))
        valid = valid.at[0].set(False)
        return jnp.where(valid[flat].reshape(hh, ww), alpha, 0.0)

    run("cc_stats_ds",
        lambda l: stats_only(l.astype(jnp.int32), alpha_lr, alpha_lr,
                             score_lr), lbl)
    run("remove_invalid_ds",
        lambda a: remove_invalid_objects_ds(a, alpha_j, score), alpha_j)
    run("trimap", lambda a: generate_trimap(a, 3, 5), alpha_j)
    run("trimap_withbg",
        lambda a: generate_trimap_withbg(a, frame_j, bg_color, 3, 5),
        alpha_j)
    run("dilate_k3_i5", lambda a: morph.dilate(a, 3, 5), alpha_j)
    run("dilate_k4_i2", lambda a: morph.dilate(a, 4, 2), alpha_j)
    run("regionfill_200",
        lambda a: regionfill(a, alpha_j, 0.5, 200), frame_j[..., 0])
    run("regionfill_50",
        lambda a: regionfill(a, alpha_j, 0.5, 50), frame_j[..., 0])

    from video_unscreen_tpu.ops.compositing import color_correct
    from video_unscreen_tpu.ops.color import yuv420_to_bgr
    run("color_correct",
        lambda a: color_correct(frame_j, a, bg_color, max(h, w)), alpha_j)
    i420 = jnp.asarray(
        rng.randint(0, 255, (h * 3 // 2, w), dtype=np.uint8))
    run("i420_to_bgr",
        lambda y: (yuv420_to_bgr(y).sum(-1) % 251.0).astype(jnp.uint8)
        [:h * 3 // 2 - h].repeat(3, 0)[:h * 3 // 2].reshape(y.shape),
        i420)

    if args.models:
        # model stages of the fused bg step (budget for BASELINE.md):
        # matting UNet forward (runs 2x/frame), STM memorize+segment
        # (per tracking frame), SCHP seed (per seed frame), and the
        # 3-channel CG regionfill cold vs warm-started (the scan carries
        # the previous frame's solve — `fused_bg._per_frame_background`)
        from video_unscreen_tpu.config import load_config
        from video_unscreen_tpu.agents.vmatting import VMattingAgent
        from video_unscreen_tpu.agents.stm import STMAgent
        from video_unscreen_tpu.pipeline.fused_green import (
            _build_seed_segmenter, seed_mask)
        from video_unscreen_tpu.ops.regionfill import (
            regionfill_with_state, solve_shape)
        from video_unscreen_tpu.ops.geometry import imnormalize

        cfg = load_config("configs/bg.json")
        long_side = max(h, w)
        vmat = VMattingAgent(model_path=cfg["vmatting"].get("model_path"),
                             input_long_side=long_side, dtype=jnp.bfloat16)
        trimap = generate_trimap(alpha_j, 3, 5)
        run("matting_unet",
            lambda a: vmat.device_forward_impl(
                vmat.variables, frame_j, a, trimap, (h, w)), alpha_j)

        stm = STMAgent(model_path=cfg["stm"].get("model_path"),
                       input_long_side=long_side, dtype=jnp.bfloat16,
                       pallas_attention=False)
        norm = imnormalize(frame_j)

        def stm_track(mask):
            mf = (mask >= 128).astype(jnp.float32)
            k, v = stm.model.apply(
                stm.variables, norm[None], mf[None], 1.0 - mf[None],
                method=lambda m, f, a, b: m.memorize(f, a, b))
            logits = stm.model.apply(
                stm.variables, norm[None], k[:, None], v[:, None],
                jnp.ones((1, 1), bool),
                method=lambda m, f, mk, mv, vl: m.segment(f, mk, mv, vl))
            return jnp.argmax(logits[0], -1).astype(jnp.float32) * 255.0

        run("stm_track", stm_track, alpha_j)

        seg = _build_seed_segmenter(cfg.get("binseg", {}), jnp.bfloat16)
        run("schp_seed",
            lambda a: seed_mask(seg, frame_j + a[..., None] * 0.0),
            alpha_j)

        hole = morph.dilate(jnp.where(alpha_j > 128, 255.0, 0.0), 3, 2)
        sh, sw = solve_shape(h, w, 0.5)

        def fill3(sols, warm=True):
            outs = []
            for c in range(3):
                # cold still chains on `sols` (x0 ~ 0 numerically) so XLA
                # cannot hoist the solve out of the timing loop
                x0 = sols[..., c] if warm else sols[..., c] * 1e-20
                _, s = regionfill_with_state(
                    frame_j[..., c], hole, 0.5, cg_iters=200, x0=x0)
                outs.append(s)
            return jnp.stack(outs, axis=-1)

        sols0 = jnp.zeros((sh, sw, 3), jnp.float32)
        run("regionfill3_cold", lambda s: fill3(s, warm=False), sols0)
        # chain on the previous solve — steady-state warm start
        run("regionfill3_warm", lambda s: fill3(s, warm=True), sols0)

    for k, v in out.items():
        print(f"{k:24s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
