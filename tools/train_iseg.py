"""Train the click-based interactive segmenter (DistMapsModel).

  python tools/train_iseg.py --steps 1000 --batch 8 --size 128 \
      --out weights/iseg.msgpack
"""
import argparse
import time

import jax
import numpy as np
import optax

from video_unscreen_tpu.models import DistMapsModel
from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.parallel.train_iseg import (make_click_batch,
                                                    make_iseg_train_state,
                                                    make_iseg_train_step)
from video_unscreen_tpu.utils.checkpoint import save_variables

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--out", type=str, default="weights/iseg.msgpack")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)} on {jax.default_backend()}")

    model = DistMapsModel()
    schedule = optax.cosine_decay_schedule(args.lr, args.steps)
    optimizer = optax.adamw(schedule, weight_decay=1e-5)
    state = make_iseg_train_state(model, optimizer,
                                  jax.random.PRNGKey(args.seed),
                                  sample_hw=(args.size, args.size))
    train_step = make_iseg_train_step(model, optimizer, mesh)

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            batch = make_click_batch(rng, args.batch,
                                     (args.size, args.size))
            state, loss = train_step(state, batch)
            if step % args.log_every == 0 or step == args.steps - 1:
                print(f"step {step:5d} loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)", flush=True)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    save_variables(args.out, variables)
    print(f"saved {args.out}")
