"""Space-to-depth decoder: exactness vs the canonical decoder.

The s2d decoder (models/s2d_decoder.py) is a pure execution rewrite — same
parameter tree, same outputs — so these tests assert bit-level structural
identity of the variables and numerical identity of the forward pass (f32,
atol covers conv-order reassociation only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digipathai_tpu.models.registry import build_model


@pytest.mark.parametrize("name", ["dense", "inception"])
class TestS2DDecoder:
    def test_same_param_tree(self, name):
        a = build_model(name, dtype=jnp.float32).init(64, seed=3)
        b = build_model(name, dtype=jnp.float32, s2d_decoder=True).init(
            64, seed=3)
        sa = jax.tree_util.tree_map(lambda x: x.shape, a)
        sb = jax.tree_util.tree_map(lambda x: x.shape, b)
        assert sa == sb
        # identical paths + init RNG folding -> identical values
        for (pa, la), (pb, lb) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b)):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_same_forward(self, name, rng):
        canon = build_model(name, dtype=jnp.float32)
        v = canon.init(64, seed=3)
        x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
        pa = np.asarray(canon.apply(v, x))
        for stages in (2, 5):  # default tail-only and full-decoder s2d
            s2d = build_model(name, dtype=jnp.float32, s2d_decoder=True,
                              s2d_stages=stages)
            pb = np.asarray(s2d.apply(v, x))
            assert pa.shape == pb.shape == (1, 64, 64, 2)
            np.testing.assert_allclose(pa, pb, atol=2e-5,
                                       err_msg=f"s2d_stages={stages}")


class TestS2DPrimitives:
    def test_s2d_roundtrip(self, rng):
        from digipathai_tpu.models.s2d_decoder import (
            depth_to_space, space_to_depth)

        x = jnp.asarray(rng.normal(0, 1, (2, 8, 6, 5)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))

    def test_upsample_conv_kernel_exact(self, rng):
        """conv3x3(upsample2x(u)) == d2s(conv3x3(u, W_A)) incl. borders."""
        import jax.lax as lax

        from digipathai_tpu.models.densenet_unet import upsample2x
        from digipathai_tpu.models.s2d_decoder import (
            depth_to_space, upsample_conv_kernel)

        u = jnp.asarray(rng.normal(0, 1, (1, 7, 9, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 4)).astype(np.float32))
        dn = ("NHWC", "HWIO", "NHWC")
        ref = lax.conv_general_dilated(upsample2x(u), k, (1, 1), "SAME",
                                       dimension_numbers=dn)
        fused = depth_to_space(lax.conv_general_dilated(
            u, upsample_conv_kernel(k), (1, 1), "SAME",
            dimension_numbers=dn))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                                   atol=1e-5)

    def test_s2d_conv_kernel_exact(self, rng):
        """conv3x3(x) == d2s(conv3x3(s2d(x), W_B)) incl. borders."""
        import jax.lax as lax

        from digipathai_tpu.models.s2d_decoder import (
            depth_to_space, s2d_conv_kernel, space_to_depth)

        x = jnp.asarray(rng.normal(0, 1, (1, 10, 8, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 5)).astype(np.float32))
        dn = ("NHWC", "HWIO", "NHWC")
        ref = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                       dimension_numbers=dn)
        got = depth_to_space(lax.conv_general_dilated(
            space_to_depth(x), s2d_conv_kernel(k), (1, 1), "SAME",
            dimension_numbers=dn))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-5)
