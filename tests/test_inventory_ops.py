"""Tests for the long-tail inventory ops (blackborder, fgbox, masks,
colorremove, deeplab variants)."""
import numpy as np
import jax.numpy as jnp

from video_unscreen_tpu.ops import compositing, geometry


def test_blackborder_roundtrip():
    img = np.zeros((40, 60, 3), np.uint8)
    img[8:30, 10:50] = 200
    cropped, loc = geometry.remove_blackborder(img)
    assert loc == (8, 10, 30, 50)
    assert cropped.shape == (22, 40, 3)
    back = geometry.add_blackborder(cropped, (40, 60), loc)
    np.testing.assert_array_equal(back, img)


def test_blackborder_no_border():
    img = np.full((10, 10), 7, np.uint8)
    cropped, loc = geometry.remove_blackborder(img)
    assert loc == (0, 0, 10, 10)
    np.testing.assert_array_equal(cropped, img)


def test_get_mask():
    img = np.zeros((8, 8, 3), np.float32)
    img[2:6, 2:6] = 200.0
    mask, binary = compositing.get_mask(jnp.asarray(img))
    assert mask.shape == (8, 8, 1)
    assert float(mask[3, 3, 0]) == 255.0
    assert float(binary[0, 0, 0]) == 0.0


def test_get_fgbox():
    mask = np.zeros((50, 70), np.float32)
    mask[10:20, 30:45] = 255.0
    top, bottom, left, right = compositing.get_fgbox(jnp.asarray(mask), 5)
    assert (int(top), int(bottom), int(left), int(right)) == (5, 24, 25, 49)


def test_get_fg_with_colorremove():
    img = np.full((16, 16, 3), (40, 190, 50), np.float32)  # all screen
    alpha = np.full((16, 16), 255.0, np.float32)
    bg = np.asarray((40, 190, 50), np.float32)
    fg = compositing.get_fg_with_colorremove(
        jnp.asarray(img), jnp.asarray(alpha), jnp.asarray(bg))
    # everything is screen-colored -> alpha zeroed -> fg is the unblended
    # residual (img - bg in HSV == 0)
    assert float(jnp.abs(fg).mean()) < 10.0


def test_deeplab_factory_variants(rng):
    import jax
    from video_unscreen_tpu.models.deeplab import build_deeplab
    x = jnp.zeros((1, 32, 32, 3))
    key = jax.random.PRNGKey(0)
    for kwargs in ({"variant": "mobilenet"},
                   {"variant": "resnet50", "plus": False}):
        model = build_deeplab(num_classes=2, **kwargs)
        out, _ = model.init_with_output(key, x)
        assert out.shape == (1, 32, 32, 2), kwargs
