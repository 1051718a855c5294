"""Mesh construction and named shardings.

Design (scaling-book style): pick a mesh, annotate shardings on params and
batch, let XLA insert the collectives. For a v5e-8 slice the default mesh
is (data=4, model=2); single-chip degenerates to (1, 1) and all shardings
become replication — the same compiled code path everywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a 2-D (data, model) mesh over the first `n_devices` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n > 1 else 1
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W, C) activations: batch over `data`, W over `model` (SP).

    XLA/GSPMD inserts halo exchanges for spatially-partitioned convs.
    """
    return NamedSharding(mesh, P("data", None, "model", None))


def param_shardings(params, mesh: Mesh, min_channels: int = 64):
    """Tensor-parallel shardings for a conv-net parameter tree.

    Conv kernels (kh, kw, cin, cout) with cout divisible by the `model`
    axis size and >= `min_channels` are sharded on the output-channel dim
    (TP); everything else is replicated. Bias/scale vectors follow their
    kernel. XLA turns the resulting mismatches into all-gathers /
    reduce-scatters over ICI.
    """
    model_size = mesh.shape["model"]

    def spec_for(path, x):
        if model_size == 1 or not hasattr(x, "ndim"):
            return NamedSharding(mesh, P())
        if x.ndim == 4 and x.shape[-1] % model_size == 0 \
                and x.shape[-1] >= min_channels:
            return NamedSharding(mesh, P(None, None, None, "model"))
        if x.ndim == 1 and x.shape[0] % model_size == 0 \
                and x.shape[0] >= min_channels:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
