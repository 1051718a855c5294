"""Multi-chip scaling: meshes, shardings, training step, streaming.

The reference's only parallelism is per-video process fan-out plus a host
decode pool (SURVEY.md §2.4). TPU-native equivalents:

- `mesh.py`: `jax.sharding.Mesh` construction + named shardings. Data
  parallelism (batch/frame-chunk axis) rides the `data` axis; tensor
  parallelism (conv output channels) and spatial partitioning ride the
  `model` axis. Collectives are XLA-inserted over ICI.
- `train.py`: a pjit training step for the flagship MattingUNet with
  dp + tp shardings (the reference ships no training loop; this is the
  framework's own, needed to produce weights).
- `streaming.py`: double-buffered host->HBM frame streaming so decode
  overlaps device compute.
"""

from .mesh import make_mesh, batch_sharding, replicate, param_shardings  # noqa: F401
from .train import make_train_state, make_train_step, matting_loss  # noqa: F401
from .streaming import FrameStreamer  # noqa: F401
