"""Headline benchmark: green-mode unscreen throughput at 1080p, one chip.

Runs the fused green pipeline (DeepLab TTA seg on non-tracking frames ->
GMM color filter -> object removal -> trimap -> matting UNet -> color
correct -> fg un-blend, all in one compiled per-frame program at 960 work
resolution; frames cross the host->HBM link as I420 uint8) over a
synthetic 1080p green-screen clip, and prints ONE JSON line:

  {"metric": "green_1080p_fps_per_chip", "value": <fps>,
   "unit": "frames/sec", "vs_baseline": <fps / CPU reference fps>}

Baseline: the reference (AnyiRao/video_unscreen) publishes no numbers and
cannot run here (no pretrained .pth weights ship with it), so the recorded
baseline is this same pipeline executed on the host CPU — measured once
and recorded in BASELINE.md (CPU_BASELINE_FPS below). The BASELINE.json
target is >=10x the CPU-reference fps.
"""

import argparse
import json
import time

import numpy as np


# Measured on this host (JAX CPU backend, fused green pipeline, 1080p,
# chunk=4, 16 frames) — see BASELINE.md.
CPU_BASELINE_FPS = 0.5


def make_clip(n, h=1080, w=1920, seed=0):
    rng = np.random.RandomState(seed)
    base = np.zeros((h, w, 3), np.uint8)
    base[...] = (40, 190, 50)
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        img = base.copy().astype(np.float32)
        cx = w // 3 + 6 * t
        blob = ((yy - h // 2) ** 2 / (260.0 ** 2)
                + (xx - cx) ** 2 / (170.0 ** 2)) < 1.0
        img[blob] = (150, 60, 170)
        img += rng.randn(h, w, 3).astype(np.float32) * 4
        frames.append(img.clip(0, 255).astype(np.uint8))
    return frames


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--chunk", type=int, default=4)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--work_long_side", type=int, default=960)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--segments", type=int, default=1,
                        help="independent clip segments batched per chip "
                             "(run_segmented when > 1)")
    parser.add_argument("--cpu", action="store_true",
                        help="run on host CPU (baseline measurement)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_unscreen_tpu.config import load_config
    from video_unscreen_tpu.pipeline.fused_green import FusedGreenPipeline

    cfg = load_config("configs/green.json")
    frames = make_clip(args.frames, args.height, args.width)
    pipe = FusedGreenPipeline(cfg, (args.height, args.width),
                              work_long_side=args.work_long_side)

    def run_once(clip):
        if args.segments > 1:
            return pipe.run_segmented(clip, n_segments=args.segments,
                                      chunk_size=args.chunk)
        return pipe.run(clip, chunk_size=args.chunk)

    # warmup: compile with one chunk
    run_once(frames[:args.chunk * max(args.segments, 1)])

    # median of repeats — the host<->device link on shared tunnels has
    # high run-to-run variance
    times = []
    for _ in range(args.repeats):
        start = time.time()
        alphas, fgs, bgs = run_once(frames)
        times.append(time.time() - start)
    assert alphas.shape[0] == len(frames)
    fps = len(frames) / sorted(times)[len(times) // 2]

    # device-compute-only throughput (link-excluded): the same compiled
    # program on device-resident input, end-to-end blocked. This is the
    # figure a PCIe-attached host would approach.
    import jax.numpy as jnp
    import cv2
    wh = (pipe.work_hw[1], pipe.work_hw[0])
    chunk = jnp.asarray(np.stack(
        [cv2.resize(f, wh) for f in frames[:args.chunk]]))
    if args.segments > 1:
        chunk = jnp.asarray(np.stack([np.asarray(chunk)] * args.segments))
        carry = pipe.init_carries(args.segments)
        step_fn = pipe.process_chunk_segments
        frames_per_call = args.chunk * args.segments
    else:
        carry = pipe.init_carry()
        step_fn = pipe.process_chunk
        frames_per_call = args.chunk
    carry, out = step_fn(carry, chunk)  # warm
    jax.block_until_ready(out)
    dev_times = []
    for _ in range(max(args.repeats, 3)):
        start = time.time()
        carry, out = step_fn(carry, chunk)
        jax.block_until_ready(out)
        dev_times.append(time.time() - start)
    device_fps = frames_per_call / sorted(dev_times)[len(dev_times) // 2]

    print(json.dumps({
        "metric": "green_1080p_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / CPU_BASELINE_FPS, 3),
        "device_fps": round(device_fps, 3),
    }))


if __name__ == "__main__":
    main()
