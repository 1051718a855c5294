"""Parallel layer tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from video_unscreen_tpu.models import MattingUNet
from video_unscreen_tpu.parallel import (FrameStreamer, make_mesh,
                                         make_train_state, make_train_step)
from video_unscreen_tpu.parallel.mesh import batch_sharding, param_shardings


def test_mesh_shape():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(1)
    assert mesh1.shape == {"data": 1, "model": 1}


def test_param_shardings_tp():
    mesh = make_mesh(8)
    params = {
        "big_conv": {"kernel": jnp.zeros((3, 3, 64, 128))},
        "small_conv": {"kernel": jnp.zeros((3, 3, 3, 8))},
        "scale": jnp.zeros((128,)),
    }
    shardings = param_shardings(params, mesh)
    assert shardings["big_conv"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, None, "model")
    assert shardings["small_conv"]["kernel"].spec == \
        jax.sharding.PartitionSpec()


def test_sharded_train_step_runs_and_reduces_loss():
    mesh = make_mesh(8)
    model = MattingUNet()
    optimizer = optax.adamw(1e-3)
    state = make_train_state(model, optimizer, jax.random.PRNGKey(0))
    train_step = make_train_step(model, optimizer, mesh)

    rng = np.random.RandomState(0)
    n, h, w = 4, 64, 64
    trimap_cls = rng.randint(0, 3, (n, h, w))
    batch = {
        "img": jnp.asarray(rng.rand(n, h, w, 3), jnp.float32),
        "alpha_pre": jnp.asarray(rng.rand(n, h, w, 1), jnp.float32),
        "trimap": jax.nn.one_hot(jnp.asarray(trimap_cls), 3),
        "alpha_gt": jnp.asarray(rng.rand(n, h, w), jnp.float32),
    }
    with mesh:
        state1, loss1 = train_step(state, batch)
        losses = [float(loss1)]
        s = state1
        for _ in range(4):
            s, l = train_step(s, batch)
            losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(s.step) == 5


def test_graft_entry_single():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 64, 64, 1)


def test_graft_entry_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_frame_streamer():
    frames = [np.full((8, 8, 3), i, np.uint8) for i in range(10)]
    chunks = list(FrameStreamer(frames, chunk_size=4))
    assert len(chunks) == 3
    assert chunks[0].shape == (4, 8, 8, 3)
    assert chunks[-1].shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(chunks[1])[0, 0, 0, 0], 4.0)


def test_select_device_places_workers_on_distinct_devices(monkeypatch):
    """`unscreen_parallel --workers N` exports UNSCREEN_DEVICE_ID=i%N per
    worker; select_device must pin default placement to that chip
    (reference semantics: `tools/unscreen.sh:16-17` CUDA_VISIBLE_DEVICES)."""
    from video_unscreen_tpu.config import select_device

    devices = jax.devices()
    assert len(devices) >= 2
    placed = []
    for dev_id in (0, 1):
        monkeypatch.setenv("UNSCREEN_DEVICE_ID", str(dev_id))
        selected = select_device()
        assert selected == devices[dev_id]
        arr = jnp.zeros((4,)) + 1.0
        placed.append(next(iter(arr.devices())))
    assert placed[0] != placed[1]

    # unset / out-of-range ids leave placement alone and return None
    monkeypatch.delenv("UNSCREEN_DEVICE_ID")
    assert select_device() is None
    monkeypatch.setenv("UNSCREEN_DEVICE_ID", "9999")
    assert select_device() is None
    monkeypatch.setenv("UNSCREEN_DEVICE_ID", "not-a-device")
    assert select_device() is None
    jax.config.update("jax_default_device", None)
