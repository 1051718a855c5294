"""Train the flagship MattingUNet on synthetic composites.

The reference has no training path (weights are read-only .pth inputs,
SURVEY.md §5); this driver produces this framework's own matting weights
with the sharded (dp + tp) train step over a device mesh.

  python tools/train_matting.py --steps 2000 --batch 32 \
      --out weights/matting_unet.msgpack
"""
import argparse
import time

import jax
import numpy as np
import optax

from video_unscreen_tpu.models import MattingUNet
from video_unscreen_tpu.parallel import (make_mesh, make_train_state,
                                         make_train_step)
from video_unscreen_tpu.parallel.data_synth import make_batch
from video_unscreen_tpu.utils.checkpoint import save_variables

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", type=str,
                        default="weights/matting_unet.msgpack")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--init_from", type=str, default=None,
                        help="fine-tune from saved variables")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)} on {jax.default_backend()}")

    model = MattingUNet()
    schedule = optax.cosine_decay_schedule(args.lr, args.steps)
    optimizer = optax.adamw(schedule, weight_decay=1e-5)
    state = make_train_state(model, optimizer, jax.random.PRNGKey(args.seed),
                             sample_hw=(args.size, args.size))
    if args.init_from:
        from video_unscreen_tpu.utils.checkpoint import load_variables
        vs = load_variables(args.init_from,
                            {"params": state.params,
                             "batch_stats": state.batch_stats})
        state = state._replace(params=vs["params"],
                               batch_stats=vs["batch_stats"])
    train_step = make_train_step(model, optimizer, mesh)

    rng = np.random.RandomState(args.seed)
    hw = (args.size, args.size)
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            batch = make_batch(rng, args.batch, hw)
            state, loss = train_step(state, batch)
            if step % args.log_every == 0 or step == args.steps - 1:
                print(f"step {step:5d} loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)", flush=True)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    save_variables(args.out, variables)
    print(f"saved {args.out}")
