"""Inception-ResNet-v2 U-Net, DeepLabv3+ and align-corners resize tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digipathai_tpu.models.registry import build_model


def _param_count(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))


class TestResizeAlignCorners:
    @pytest.mark.parametrize("shape,out", [((1, 4, 4, 2), (9, 9)),
                                           ((2, 7, 5, 3), (14, 10)),
                                           ((1, 1, 1, 4), (8, 8)),
                                           ((1, 16, 16, 1), (4, 4))])
    def test_matches_torch(self, rng, shape, out):
        import torch
        import torch.nn.functional as F

        from digipathai_tpu.ops.resize import resize_bilinear_align_corners

        x = rng.random(shape).astype(np.float32)
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out))
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.interpolate(t, size=out, mode="bilinear", align_corners=True)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestInceptionUNet:
    def test_forward_and_names(self):
        b = build_model("inception", dtype=jnp.float32)
        v = b.init(64)
        n = _param_count(v)
        # IRv2 encoder ~54M + U-Net decoder ~12M
        assert 55e6 < n < 75e6, n
        p = v["params"]
        # named layers present
        for expected in ["conv_7b", "block35_1_conv", "block17_20_conv",
                         "block8_10_conv", "conv2d", "batch_normalization"]:
            assert expected in p, expected
        # conv_7b is 1536-wide 1x1
        assert p["conv_7b"]["kernel"].shape[-1] == 1536
        # residual projection convs have bias and no BN
        assert "bias" in p["block35_1_conv"]
        assert "block35_1_conv_bn" not in p
        # encoder BNs have no scale (gamma) — Keras scale=False
        assert "scale" not in p["batch_normalization"]
        y = jax.jit(lambda v, x: b.apply(v, x))(v, jnp.zeros((1, 64, 64, 3)))
        assert y.shape == (1, 64, 64, 2)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-3)


class TestDeepLabV3Plus:
    def test_forward_and_names(self):
        b = build_model("deeplabv3", dtype=jnp.float32)
        v = b.init(64)
        n = _param_count(v)
        # Xception-65 + ASPP + decoder ~41M
        assert 35e6 < n < 48e6, n
        p = v["params"]
        for expected in ["entry_flow_conv1_1", "middle_flow_unit_16_separable_conv3_pointwise",
                         "exit_flow_block2_separable_conv3_pointwise",
                         "image_pooling", "aspp0", "aspp3_depthwise",
                         "concat_projection", "feature_projection0",
                         "decoder_conv1_pointwise", "custom_logits_semantic"]:
            assert expected in p, expected
        # depthwise kernels are grouped: (3, 3, 1, C)
        assert p["aspp3_depthwise"]["kernel"].shape[:3] == (3, 3, 1)
        # logits head has bias (plain Conv2D), backbone convs don't
        assert "bias" in p["custom_logits_semantic"]
        assert "bias" not in p["entry_flow_conv1_1"]
        y = jax.jit(lambda v, x: b.apply(v, x))(v, jnp.zeros((1, 64, 64, 3)))
        assert y.shape == (1, 64, 64, 2)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-3)
