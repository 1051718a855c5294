"""video_unscreen_tpu — a TPU-native (JAX/XLA/Pallas) video unscreen framework.

A ground-up rebuild of the capabilities of AnyiRao/video_unscreen
(coarse-to-fine automatic video unscreen, IEEE TMM 2022) designed for TPU:

- All pixel math runs as jitted XLA programs over device-resident tensors
  (float32/bfloat16, images kept in 0..255 scale to preserve the reference's
  uint8 semantics).
- Per-frame recurrences (tracking, alpha_pre, STM memory) are `lax.scan`
  carries; batch/TTA dimensions are leading axes of single compiled calls.
- Multi-chip scaling goes through `jax.sharding.Mesh` + collectives
  (see `video_unscreen_tpu.parallel`), not process fan-out.
- Host side is a thin shell: codec I/O, config, artifact store.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  L1 ops/        pure jittable tensor ops (geometry, color, morphology, ...)
  L2 models/     flax/linen model families (deeplab, human_parse, stm, ...)
  L3 agents/     stateful pipeline stages with the reference agent contract
  L4 configs/    JSON configs (same schema as reference configs/*.json)
  L5 pipeline/   mode drivers (green, bg, bg_offline, replace, eval)
"""

__version__ = "0.1.0"


def _honor_platform_env():
    """Apply $JAX_PLATFORMS before any backend is initialized.

    TPU plugin platforms (e.g. tunneled axon chips) register themselves
    regardless of the env var, and the TPU is single-client — a CLI asked
    to run on "cpu" must never claim the chip out from under a training
    job. Importing any submodule can touch the backend, so this runs at
    package import, not at driver start."""
    import os
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        import jax
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:  # backend already locked in this process
            pass


_honor_platform_env()
