"""Measure host<->device link bandwidth and duplex overlap.

The fused pipelines are wire-bound on tunneled TPU hosts (BASELINE.md);
this probe quantifies the link so wire-format decisions (I420 h2d, alpha
d2h) are made from data. Prints one human-readable block.

  PYTHONPATH=.:$PYTHONPATH python tools/link_probe.py
"""
import argparse
import time

import numpy as np


def _median(xs):
    return sorted(xs)[len(xs) // 2]


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=float, default=8.0,
                        help="buffer size in MB")
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n = int(args.mb * 1e6)
    host_buf = np.random.RandomState(0).randint(
        0, 255, n, dtype=np.uint8)
    dev_buf = jnp.asarray(host_buf)
    jax.block_until_ready(dev_buf)

    h2d_t, d2h_t, both_t = [], [], []
    for _ in range(args.repeats):
        st = time.time()
        x = jax.device_put(host_buf)
        jax.block_until_ready(x)
        h2d_t.append(time.time() - st)

        st = time.time()
        _ = np.asarray(dev_buf)
        d2h_t.append(time.time() - st)

        # duplex: start the d2h async, then do the h2d, then sync both
        st = time.time()
        dev_buf.copy_to_host_async()
        y = jax.device_put(host_buf)
        jax.block_until_ready(y)
        _ = np.asarray(dev_buf)
        both_t.append(time.time() - st)

    h2d = args.mb / _median(h2d_t)
    d2h = args.mb / _median(d2h_t)
    both = 2 * args.mb / _median(both_t)
    print(f"h2d: {h2d:.1f} MB/s  d2h: {d2h:.1f} MB/s  "
          f"duplex(2x{args.mb:.0f}MB): {both:.1f} MB/s aggregate")
    overlap = _median(both_t) / (_median(h2d_t) + _median(d2h_t))
    print(f"duplex time / serialized time: {overlap:.2f} "
          f"(1.0 = no overlap, 0.5 = full duplex)")
