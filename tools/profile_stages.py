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

    for k, v in out.items():
        print(f"{k:24s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
