"""Train the SCHP human parser on synthetic person composites.

Produces weights for the HumanSegAgent (`configs/bg.json binseg` with
`"type": "human"`) — the reference's LIP .pth is unavailable, so this is
how bg mode gets a working non-chroma segmenter on arbitrary footage
(reference call site: `tools/unscreen/bg.py:56`).

  python tools/train_human.py --steps 2000 --batch 8 --size 224 \
      --out weights/schp_human.msgpack
"""
import argparse
import time

import jax
import numpy as np
import optax

from video_unscreen_tpu.models import SCHPHumanParser
from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.parallel.train_human import (make_human_batch,
                                                     make_human_train_state,
                                                     make_human_train_step)
from video_unscreen_tpu.utils.checkpoint import save_variables

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--out", type=str, default="weights/schp_human.msgpack")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_every", type=int, default=25)
    parser.add_argument("--layers", type=int, nargs=4, default=(3, 4, 23, 3),
                        help="backbone stage depths (reference R101)")
    parser.add_argument("--init_from", type=str, default=None,
                        help="resume/fine-tune from saved variables")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)} on {jax.default_backend()}")

    model = SCHPHumanParser(num_classes=20, layers=tuple(args.layers))
    schedule = optax.cosine_decay_schedule(args.lr, args.steps)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(schedule, weight_decay=1e-5))
    state = make_human_train_state(model, optimizer,
                                   jax.random.PRNGKey(args.seed),
                                   sample_hw=(args.size, args.size))
    if args.init_from:
        from video_unscreen_tpu.utils.checkpoint import load_variables
        vs = load_variables(args.init_from,
                            {"params": state.params,
                             "batch_stats": state.batch_stats})
        state = state._replace(params=vs["params"],
                               batch_stats=vs["batch_stats"])
    train_step = make_human_train_step(model, optimizer, mesh)

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            batch = make_human_batch(rng, args.batch,
                                     (args.size, args.size), raw_uint8=True)
            state, loss = train_step(state, batch)
            if step % args.log_every == 0 or step == args.steps - 1:
                print(f"step {step:5d} loss {float(loss):.4f} "
                      f"({time.time() - t0:.1f}s)", flush=True)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    save_variables(args.out, variables)
    print(f"saved {args.out}")
