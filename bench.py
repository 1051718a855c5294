"""Headline benchmark: green-mode unscreen throughput at 1080p, one chip.

Runs the fused green pipeline (DeepLab TTA seg on non-tracking frames ->
GMM color filter -> object removal -> trimap -> matting UNet -> color
correct -> fg un-blend, all in one compiled per-frame program at 960 work
resolution; frames cross the host->HBM link as I420 uint8 — the
production wire opt-in) over a synthetic 1080p green-screen clip, and
prints ONE JSON line:

  {"metric": "green_1080p_fps_per_chip", "value": <fps>,
   "unit": "frames/sec", "vs_baseline": <fps / CPU reference fps>,
   "device_fps": <link-excluded fps>, "segments": <S>,
   "bg_fps": <fused bg-mode wall fps>, "bg_device_fps": ...}

Baseline: the reference (AnyiRao/video_unscreen) publishes no numbers and
cannot run here (no pretrained .pth weights ship with it), so the recorded
baseline is this same pipeline executed on the host CPU — measured once
and recorded in BASELINE.md (CPU_BASELINE_FPS below). The BASELINE.json
target is >=10x the CPU-reference fps.

Segment batching (--segments, default 8): S independent clip segments
advance in lockstep through one compiled scan — S x the device work per
dispatch at identical wire bytes/frame, the single-chip MXU-utilization
lever (VERDICT round-2 item 3).
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


def make_natural_clip(n, h=1080, w=1920, seed=1):
    """Textured-background clip for bg mode (person-ish moving blob)."""
    import cv2
    rng = np.random.RandomState(seed)
    small = rng.rand(24, 24, 3).astype(np.float32)
    bg = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    bg = (bg.clip(0, 1) * 255).astype(np.float32)
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        img = bg.copy()
        cx = w // 3 + 6 * t
        blob = ((yy - h // 2) ** 2 / (300.0 ** 2)
                + (xx - cx) ** 2 / (140.0 ** 2)) < 1.0
        img[blob] = (150, 60, 170)
        img += rng.randn(h, w, 3).astype(np.float32) * 3
        frames.append(img.clip(0, 255).astype(np.uint8))
    return frames


def measure_link(mb=4.0, repeats=3):
    """Median host<->device bandwidth (MB/s), measured in-process so the
    wall-fps numbers in the same JSON line are interpretable — the tunnel
    ranges ~8-40 MB/s run to run and wall fps ~= tunnel_MBps / wire
    bytes-per-frame (BASELINE.md). Same routine as tools/link_probe.py."""
    import jax

    import jax.numpy as jnp

    n = int(mb * 1e6)
    host_buf = np.random.RandomState(0).randint(0, 255, n, dtype=np.uint8)
    bump = jax.jit(lambda x, i: x + i)
    dev_buf = jax.device_put(host_buf)
    jax.block_until_ready(dev_buf)
    h2d_t, d2h_t = [], []
    for i in range(repeats):
        st = time.time()
        x = jax.device_put(host_buf)
        jax.block_until_ready(x)
        h2d_t.append(time.time() - st)
        # a FRESH device array each repeat — np.asarray on a previously
        # fetched buffer returns the cached host copy and reads as
        # memcpy speed, not the link
        y = bump(dev_buf, jnp.uint8(i + 1))
        jax.block_until_ready(y)
        st = time.time()
        _ = np.asarray(y)
        d2h_t.append(time.time() - st)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    return mb / med(h2d_t), mb / med(d2h_t)


def _flops_per_frame(step_fn, pipe, carry, chunk_dev, frames_per_call):
    """XLA-counted FLOPs per frame of the compiled fused step, via
    `lower().compile().cost_analysis()` (VERDICT r4 item 4). The count
    is XLA's model-level estimate (dtype-agnostic op count, convs as
    2*MACs), the right numerator for an MFU figure; returns None where
    the backend offers no analysis.

    `pipe` is passed explicitly: `step_fn` is a jit-wrapped method with
    self static, and attribute access on the bound method delegates
    `.lower` to the unbound jit wrapper — so `.lower` must be given
    `self` again or it raises TypeError (the round-4 bench swallowed
    exactly that, which is why BENCH_r04 carries no mfu fields)."""
    try:
        lowered = step_fn.lower(pipe, carry, chunk_dev)
    except Exception:
        return None
    for stage in (lambda: lowered.compile(), lambda: lowered):
        try:
            cost = stage().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost["flops"]) / frames_per_call
        except Exception:
            continue
    return None


def bench_pipeline(pipe, frames, chunk, segments, repeats):
    """(wall_fps, device_fps, flops_per_frame) for a fused pipeline."""
    import cv2
    import jax
    import jax.numpy as jnp

    def run_once(clip):
        if segments > 1:
            return pipe.run_segmented(clip, n_segments=segments,
                                      chunk_size=chunk)
        return pipe.run(clip, chunk_size=chunk)

    # warmup: compile with one chunk
    run_once(frames[:chunk * max(segments, 1)])

    # median of repeats — the host<->device link on shared tunnels has
    # high run-to-run variance
    times = []
    for _ in range(repeats):
        start = time.time()
        outs = run_once(frames)
        times.append(time.time() - start)
    assert outs[0].shape[0] == len(frames)
    fps = len(frames) / sorted(times)[len(times) // 2]

    # device-compute-only throughput (link-excluded): the same compiled
    # program on device-resident input, end-to-end blocked. This is the
    # figure a PCIe-attached host would approach.
    wh = (pipe.work_hw[1], pipe.work_hw[0])
    arr = np.stack([cv2.resize(f, wh) for f in frames[:chunk]])
    if pipe.wire == "yuv420":
        arr = np.stack([
            cv2.cvtColor(np.ascontiguousarray(f), cv2.COLOR_BGR2YUV_I420)
            for f in arr])
    chunk_dev = jnp.asarray(arr)
    if segments > 1:
        chunk_dev = jnp.asarray(np.stack([arr] * segments))
        carry = pipe.init_carries(segments)
        step_fn = pipe.process_chunk_segments
        frames_per_call = chunk * segments
    else:
        carry = pipe.init_carry()
        step_fn = pipe.process_chunk
        frames_per_call = chunk
    flops = _flops_per_frame(step_fn, pipe, carry, chunk_dev,
                             frames_per_call)
    carry, out = step_fn(carry, chunk_dev)  # warm
    jax.block_until_ready(out)
    dev_times = []
    for _ in range(max(repeats, 3)):
        start = time.time()
        carry, out = step_fn(carry, chunk_dev)
        jax.block_until_ready(out)
        dev_times.append(time.time() - start)
    device_fps = frames_per_call / sorted(dev_times)[len(dev_times) // 2]
    return fps, device_fps, flops


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--chunk", type=int, default=4)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--work_long_side", type=int, default=960)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--segments", type=int, default=8,
                        help="independent clip segments batched per chip "
                             "(run_segmented when > 1; the recorded sweep "
                             "on 1080p green: device fps 52/62/78 at "
                             "S=1/4/8, wall tunnel-bound ~10-12 across "
                             "all S)")
    parser.add_argument("--wire", type=str, default="yuv420",
                        choices=("bgr", "yuv420"))
    parser.add_argument("--mode", type=str, default="both",
                        choices=("green", "bg", "both"))
    parser.add_argument("--bg_frames", type=int, default=64,
                        help="bg-mode clip length; at --segments 8 the "
                             "default gives 8-frame segments so the "
                             "SCHP-seed ratio (1 seed per 8 frames) "
                             "resembles production, not the every-other-"
                             "frame reseed a 2-frame segment would pay")
    parser.add_argument("--cpu", action="store_true",
                        help="run on host CPU (baseline measurement)")
    parser.add_argument("--peak_tflops", type=float, default=197.0,
                        help="accelerator peak dense TFLOP/s for the MFU "
                             "figure (default: v5e bf16 197)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_unscreen_tpu.config import load_config
    from video_unscreen_tpu.pipeline.fused_green import FusedGreenPipeline

    record = {"metric": "green_1080p_fps_per_chip",
              "unit": "frames/sec", "segments": args.segments,
              "wire": args.wire}

    # link probe first: the wall numbers below are bandwidth-bound on
    # tunneled hosts, so the JSON line records the link they saw
    h2d, d2h = measure_link()
    record["tunnel_h2d_MBps"] = round(h2d, 1)
    record["tunnel_d2h_MBps"] = round(d2h, 1)

    if args.mode in ("green", "both"):
        cfg = load_config("configs/green.json")
        frames = make_clip(args.frames, args.height, args.width)
        pipe = FusedGreenPipeline(cfg, (args.height, args.width),
                                  work_long_side=args.work_long_side,
                                  wire=args.wire)
        fps, device_fps, flops = bench_pipeline(pipe, frames, args.chunk,
                                                args.segments, args.repeats)
        record["value"] = round(fps, 3)
        record["vs_baseline"] = round(fps / CPU_BASELINE_FPS, 3)
        record["device_fps"] = round(device_fps, 3)
        if flops:
            tflops = flops * device_fps / 1e12
            record["gflops_per_frame"] = round(flops / 1e9, 2)
            record["device_tflops"] = round(tflops, 2)
            record["mfu_pct"] = round(100.0 * tflops / args.peak_tflops, 2)

    if args.mode in ("bg", "both"):
        bg_cfg = load_config("configs/bg.json")
        bg_frames = make_natural_clip(args.bg_frames, args.height,
                                      args.width)
        from video_unscreen_tpu.pipeline.fused_bg import FusedBgPipeline
        bg_pipe = FusedBgPipeline(bg_cfg, (args.height, args.width),
                                  work_long_side=args.work_long_side,
                                  wire=args.wire)
        bg_fps, bg_device_fps, bg_flops = bench_pipeline(
            bg_pipe, bg_frames, args.chunk, args.segments,
            max(args.repeats - 2, 3))
        record["bg_fps"] = round(bg_fps, 3)
        record["bg_device_fps"] = round(bg_device_fps, 3)
        if bg_flops:
            bg_tflops = bg_flops * bg_device_fps / 1e12
            record["bg_gflops_per_frame"] = round(bg_flops / 1e9, 2)
            record["bg_device_tflops"] = round(bg_tflops, 2)
            record["bg_mfu_pct"] = round(
                100.0 * bg_tflops / args.peak_tflops, 2)
        if args.mode == "bg":
            record["metric"] = "bg_1080p_fps_per_chip"
            record["value"] = round(bg_fps, 3)
            record["vs_baseline"] = round(bg_fps / CPU_BASELINE_FPS, 3)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
