"""STM ring-buffer semantics: memory_step throttle + FIFO eviction."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_unscreen_tpu.agents.stm import STMAgent


@pytest.fixture(scope="module")
def agent():
    return STMAgent(input_long_side=32, memory_step=2, memory_capacity=2)


def _run(agent, n_frames):
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(n_frames, 32, 32, 3), jnp.float32)
    mask0 = jnp.zeros((32, 32), jnp.float32).at[8:24, 8:24].set(1.0)
    return agent.device_inference(agent.variables, frames, mask0)


def test_bank_commit_schedule(agent):
    """With memory_step=2, commits happen at t=1,3,5,... and the bank
    saturates at capacity (FIFO roll, never an index overflow)."""
    preds = _run(agent, 6)
    assert preds.shape == (6, 32, 32, 2)
    # softmax scores in [0,1], rows sum to 1
    s = np.asarray(preds[3])
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-4)


def test_two_frame_call_matches_reference_usage(agent):
    """bg mode always passes exactly 2 frames (`tools/unscreen/bg.py:53`);
    the bank is empty at t=1, so segmentation sees only the prev-frame
    memory — identical to the reference's effective behavior."""
    preds = _run(agent, 2)
    assert preds.shape[0] == 2
    # frame 0 is the input mask passthrough
    m0 = np.asarray(preds[0, ..., 1])
    assert m0[16, 16] == 1.0 and m0[0, 0] == 0.0
