"""Train the STM mask-propagation net on synthetic frame pairs.

  python tools/train_stm.py --steps 800 --batch 8 --size 128 \
      --out weights/stm.msgpack
"""
import argparse
import time

import jax
import numpy as np
import optax

from video_unscreen_tpu.models import STM
from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.parallel.train_stm import (make_clip_batch,
                                                   make_stm_train_state,
                                                   make_stm_train_step)
from video_unscreen_tpu.utils.checkpoint import save_variables

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--out", type=str, default="weights/stm.msgpack")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--clip_len", type=int, default=3,
                        help="frames per training clip; clip_len-1 "
                             "memory slots")
    parser.add_argument("--clip_lens", type=str, default=None,
                        help="comma list of clip lengths cycled across "
                             "steps (e.g. 2,4,8) — trains the attention "
                             "to work at every bank fill level the "
                             "inference-time FIFO ring reaches "
                             "(agents/stm.py device_inference); overrides "
                             "--clip_len")
    parser.add_argument("--sizes", type=str, default=None,
                        help="comma list of square train sizes cycled "
                             "across steps (e.g. 128,256) — multi-scale "
                             "training; single-scale fine-tuning at 256 "
                             "catastrophically forgets 128-scale "
                             "propagation. Overrides --size")
    parser.add_argument("--save_every", type=int, default=0,
                        help="checkpoint to --out every N steps (0 = "
                             "only at the end) so a parallel CPU process "
                             "can evaluate the propagation gate mid-run")
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

    # einsum attention for training (the Pallas flash kernel is
    # forward-only)
    model = STM(pallas_attention=False)
    schedule = optax.cosine_decay_schedule(args.lr, args.steps)
    optimizer = optax.adamw(schedule, weight_decay=1e-5)
    state = make_stm_train_state(model, optimizer,
                                 jax.random.PRNGKey(args.seed),
                                 sample_hw=(args.size, args.size))
    if args.init_from:
        from video_unscreen_tpu.utils.checkpoint import load_variables
        vs = load_variables(args.init_from,
                            {"params": state.params,
                             "batch_stats": state.batch_stats})
        state = state._replace(params=vs["params"],
                               batch_stats=vs["batch_stats"])
    train_step = make_stm_train_step(model, optimizer, mesh)

    clip_lens = ([int(v) for v in args.clip_lens.split(",")]
                 if args.clip_lens else [args.clip_len])
    sizes = ([int(v) for v in args.sizes.split(",")]
             if args.sizes else [args.size])

    def checkpoint():
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        save_variables(args.out, variables)

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            cl = clip_lens[step % len(clip_lens)]
            sz = sizes[(step // len(clip_lens)) % len(sizes)]
            batch = make_clip_batch(rng, args.batch, (sz, sz),
                                    clip_len=cl)
            state, loss = train_step(state, batch)
            if step % args.log_every == 0 or step == args.steps - 1:
                print(f"step {step:5d} T={cl} loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            if args.save_every and step and step % args.save_every == 0:
                checkpoint()
                print(f"checkpoint @ step {step}", flush=True)

    checkpoint()
    print(f"saved {args.out}")
