"""Train the DeepLabV3+ binary segmenter on synthetic composites.

Produces weights for the SegAgent (`configs/*.json binseg.model_path`) —
the reference's deeplab50_weights_v5.pth is unavailable, so this is how
the neural seg path gets its quality.

  python tools/train_binseg.py --steps 800 --batch 8 --size 128 \
      --out weights/deeplab_binseg.msgpack
"""
import argparse
import time

import jax
import numpy as np
import optax

from video_unscreen_tpu.models import build_deeplab
from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.parallel.train_seg import (make_seg_batch,
                                                   make_seg_train_state,
                                                   make_seg_train_step)
from video_unscreen_tpu.utils.checkpoint import save_variables

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--out", type=str,
                        default="weights/deeplab_binseg.msgpack")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--init_from", type=str, default=None,
                        help="fine-tune from saved variables")
    parser.add_argument("--save_every", type=int, default=0,
                        help="checkpoint to --out every N steps (0 = "
                             "only at the end)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)} on {jax.default_backend()}")

    model = build_deeplab(num_classes=2)
    schedule = optax.cosine_decay_schedule(args.lr, args.steps)
    optimizer = optax.adamw(schedule, weight_decay=1e-5)
    state = make_seg_train_state(model, optimizer,
                                 jax.random.PRNGKey(args.seed),
                                 sample_hw=(args.size, args.size))
    if args.init_from:
        from video_unscreen_tpu.utils.checkpoint import load_variables
        vs = load_variables(args.init_from,
                            {"params": state.params,
                             "batch_stats": state.batch_stats})
        state = state._replace(params=vs["params"],
                               batch_stats=vs["batch_stats"])
    train_step = make_seg_train_step(model, optimizer, mesh)

    def checkpoint():
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        save_variables(args.out, variables)

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            batch = make_seg_batch(rng, args.batch,
                                   (args.size, args.size))
            state, loss = train_step(state, batch)
            if step % args.log_every == 0 or step == args.steps - 1:
                print(f"step {step:5d} loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            if args.save_every and step and step % args.save_every == 0:
                checkpoint()
                print(f"checkpoint @ step {step}", flush=True)

    checkpoint()
    print(f"saved {args.out}")
