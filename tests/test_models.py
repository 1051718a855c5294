"""Model family smoke tests: init + forward shapes on tiny inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_unscreen_tpu.models import (DeepLabV3Plus, DistMapsModel,
                                       MattingUNet, ResNet, SCHPHumanParser,
                                       STM, build_deeplab)
from video_unscreen_tpu.models.matting_unet import spectral_normalize_tree
from video_unscreen_tpu.models.stm import memory_read


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestMattingUNet:
    def test_forward_shape(self, key):
        model = MattingUNet()
        img = jnp.zeros((1, 64, 64, 3))
        alpha_pre = jnp.zeros((1, 64, 64, 1))
        trimap = jnp.zeros((1, 64, 64, 3))
        variables = model.init(key, img, alpha_pre, trimap)
        out = model.apply(variables, img, alpha_pre, trimap)
        assert out.shape == (1, 64, 64, 1)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()

    def test_train_mode_updates_stats(self, key):
        model = MattingUNet()
        img = jnp.ones((2, 32, 32, 3))
        ap = jnp.zeros((2, 32, 32, 1))
        tri = jnp.zeros((2, 32, 32, 3))
        variables = model.init(key, img, ap, tri)
        out, mutated = model.apply(variables, img, ap, tri, train=True,
                                   mutable=["batch_stats"])
        assert out.shape == (2, 32, 32, 1)
        assert "batch_stats" in mutated

    def test_spectral_normalize(self, key):
        model = MattingUNet()
        variables = model.init(key, jnp.zeros((1, 32, 32, 3)),
                               jnp.zeros((1, 32, 32, 1)),
                               jnp.zeros((1, 32, 32, 3)))
        folded = spectral_normalize_tree(variables["params"])
        # every conv kernel now has leading singular value <= ~1
        def check(p, w):
            if hasattr(w, "ndim") and w.ndim == 4:
                mat = np.asarray(w).reshape(-1, w.shape[-1])
                s = np.linalg.svd(mat, compute_uv=False)[0]
                assert s < 1.2, (p, s)
        jax.tree_util.tree_map_with_path(check, folded)


class TestSubpixelConvTranspose:
    def test_matches_conv_transpose(self, key):
        """The phase-decomposed upsampler must be bit-near-exact vs the
        fractionally-strided conv it replaces (same kernel param), so
        shipped matting checkpoints keep their quality unchanged."""
        import flax.linen as nn
        from video_unscreen_tpu.models.matting_unet import \
            SubpixelConvTranspose
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 9, 7, 6).astype(np.float32))
        k = jnp.asarray(rng.randn(4, 4, 6, 5).astype(np.float32))
        ref = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME",
                               use_bias=False).apply(
            {"params": {"kernel": k}}, x)
        got = SubpixelConvTranspose(5).apply({"params": {"kernel": k}}, x)
        assert got.shape == ref.shape == (2, 18, 14, 5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_param_shape_matches_checkpoint(self, key):
        from video_unscreen_tpu.models.matting_unet import \
            SubpixelConvTranspose
        v = SubpixelConvTranspose(8).init(key, jnp.zeros((1, 4, 4, 3)))
        assert v["params"]["kernel"].shape == (4, 4, 3, 8)


class TestResNet:
    def test_resnet50_pyramid(self, key):
        model = ResNet()
        feats = model.init_with_output(key, jnp.zeros((1, 64, 64, 3)))[0]
        assert feats["c1"].shape == (1, 16, 16, 256)
        assert feats["c4"].shape == (1, 2, 2, 2048)

    def test_dilated_resnet50(self, key):
        model = ResNet(replace_stride_with_dilation=(False, True, True))
        feats = model.init_with_output(key, jnp.zeros((1, 64, 64, 3)))[0]
        # output stride 8: c4 keeps the c2 spatial size
        assert feats["c4"].shape == (1, 8, 8, 2048)

    def test_three_stage_trunk(self, key):
        model = ResNet(layers=(3, 4, 6), num_stages=3)
        feats = model.init_with_output(key, jnp.zeros((1, 64, 64, 3)))[0]
        assert feats["c3"].shape == (1, 4, 4, 1024)
        assert "c4" not in feats


class TestDeepLab:
    def test_forward_shape(self, key):
        model = build_deeplab(num_classes=2)
        variables = model.init(key, jnp.zeros((1, 65, 65, 3)))
        out = model.apply(variables, jnp.zeros((2, 65, 65, 3)))
        assert out.shape == (2, 65, 65, 2)


class TestSCHP:
    def test_forward_shape(self, key):
        model = SCHPHumanParser(layers=(1, 1, 1, 1))  # tiny for test speed
        variables = model.init(key, jnp.zeros((1, 64, 64, 3)))
        out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
        # fusion logits at 1/4 resolution, 20 classes
        assert out.shape == (1, 16, 16, 20)


class TestSTM:
    def test_memory_read_masked(self):
        b, t, hm, wm = 1, 4, 4, 4
        k = jnp.asarray(np.random.RandomState(0).randn(b, t, hm, wm, 128),
                        jnp.float32)
        v = jnp.asarray(np.random.RandomState(1).randn(b, t, hm, wm, 512),
                        jnp.float32)
        qk = k[:, 0]
        qv = v[:, 0]
        valid1 = jnp.asarray([[True, False, False, False]])
        out1 = memory_read(k, v, valid1, qk, qv)
        # masking all but slot 0 == using a bank of only slot 0
        out_ref = memory_read(k[:, :1], v[:, :1],
                              jnp.asarray([[True]]), qk, qv)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)
        assert out1.shape == (b, hm, wm, 1024)

    def test_memorize_segment(self, key):
        model = STM()
        frame = jnp.zeros((1, 64, 64, 3))
        mem_k = jnp.zeros((1, 2, 4, 4, 128))
        mem_v = jnp.zeros((1, 2, 4, 4, 512))
        valid = jnp.asarray([[True, False]])
        variables = model.init(key, frame, mem_k, mem_v, valid)
        logits = model.apply(variables, frame, mem_k, mem_v, valid)
        assert logits.shape == (1, 64, 64, 2)
        k4, v4 = model.apply(variables, frame, jnp.zeros((1, 64, 64)),
                             jnp.zeros((1, 64, 64)),
                             method=lambda m, f, mf, mb: m.memorize(f, mf, mb))
        assert k4.shape == (1, 4, 4, 128)
        assert v4.shape == (1, 4, 4, 512)


class TestDistMaps:
    def test_forward_shape(self, key):
        model = DistMapsModel()
        img = jnp.zeros((1, 64, 64, 3))
        pts = jnp.asarray([[[1.0, 10.0, 12.0], [0.0, -1.0, -1.0]]])
        variables = model.init(key, img, pts)
        out = model.apply(variables, img, pts)
        assert out.shape == (1, 64, 64, 1)

    def test_dist_maps_polarity(self):
        from video_unscreen_tpu.models.iseg import dist_maps
        pts = jnp.asarray([[[1.0, 5.0, 5.0], [0.0, 20.0, 20.0]]])
        maps = dist_maps(pts, 32, 32)
        m = np.asarray(maps[0])
        # positive map minimal at the positive click, ~1 far away
        assert m[5, 5, 0] < 0.1
        assert m[20, 20, 1] < 0.1
        assert m[31, 31, 0] > 0.15
