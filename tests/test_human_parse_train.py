"""SCHP human-parser training step + adaptive-pool golden test."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from video_unscreen_tpu.models.human_parse import (SCHPHumanParser,
                                                   _adaptive_avg_pool)
from video_unscreen_tpu.parallel import make_mesh
from video_unscreen_tpu.parallel.train_human import (human_loss,
                                                     make_human_batch,
                                                     make_human_train_state,
                                                     make_human_train_step)


@pytest.mark.parametrize("hw,size", [((7, 9), 3), ((4, 4), 6), ((14, 14), 6),
                                     ((5, 3), 1)])
def test_adaptive_avg_pool_matches_torch(hw, size):
    """PyTorch floor/ceil bin semantics — in particular no empty (NaN)
    bins when the feature map is smaller than the bin count."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, *hw, 3).astype(np.float32)
    ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), size))
    ref = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(ours).all()


@pytest.mark.slow
def test_human_train_step_decreases_loss():
    model = SCHPHumanParser(num_classes=20, layers=(1, 1, 1, 1))
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(1e-3))
    state = make_human_train_state(model, optimizer, jax.random.PRNGKey(0),
                                   sample_hw=(48, 48))
    mesh = make_mesh()
    step = make_human_train_step(model, optimizer, mesh)
    rng = np.random.RandomState(0)
    losses = []
    with mesh:
        for _ in range(4):
            batch = make_human_batch(rng, 4, (48, 48), raw_uint8=True)
            state, loss = step(state, batch)
            losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
