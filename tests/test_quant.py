"""Opt-in int8 quantized inference (models/quant.py).

Checks the three contracts that make ``quantized=True`` safe to offer:
the parameter tree is byte-identical to the exact model (checkpoints load
unchanged), narrow/grouped convs fall back to the exact path, and the
quantization error of an eligible conv is small and bounded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestQuantConv:
    def test_wide_conv_error_bounded(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 256)), jnp.float32)
        q = QuantConv(128, (3, 3), padding="SAME", dtype=jnp.float32)
        e = nn.Conv(128, (3, 3), padding="SAME", dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        yq = q.apply(v, x)
        ye = e.apply(v, x)  # same param tree by construction
        scale = float(jnp.max(jnp.abs(ye)))
        err = float(jnp.max(jnp.abs(yq - ye))) / scale
        # int8 symmetric quant: worst-case relative error ~1-2%
        assert err < 0.03, err

    def test_param_tree_identical_to_nn_conv(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        x = jnp.zeros((1, 8, 8, 256), jnp.float32)
        vq = QuantConv(256, (3, 3)).init(jax.random.PRNGKey(0), x)
        ve = nn.Conv(256, (3, 3)).init(jax.random.PRNGKey(0), x)
        tq = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vq)
        te = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ve)
        assert tq == te

    def test_narrow_conv_is_exact(self):
        """Below min_channels the layer must use the exact nn.Conv path."""
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 64)), jnp.float32)
        q = QuantConv(64, (3, 3), padding="SAME", dtype=jnp.float32)
        e = nn.Conv(64, (3, 3), padding="SAME", dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(q.apply(v, x)),
                                      np.asarray(e.apply(v, x)))

    def test_depthwise_is_exact(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 256)), jnp.float32)
        q = QuantConv(256, (3, 3), feature_group_count=256,
                      dtype=jnp.float32)
        e = nn.Conv(256, (3, 3), feature_group_count=256, dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(np.asarray(q.apply(v, x)),
                                      np.asarray(e.apply(v, x)))

    def test_strided_quant_conv_matches_shape_and_value(self):
        import flax.linen as nn

        from digipathai_tpu.models.quant import QuantConv

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 192)), jnp.float32)
        q = QuantConv(192, (3, 3), strides=(2, 2), padding="SAME",
                      dtype=jnp.float32)
        e = nn.Conv(192, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=jnp.float32)
        v = q.init(jax.random.PRNGKey(0), x)
        yq, ye = q.apply(v, x), e.apply(v, x)
        assert yq.shape == ye.shape
        rel = float(jnp.max(jnp.abs(yq - ye)) / jnp.max(jnp.abs(ye)))
        assert rel < 0.03, rel


class TestQuantizedModel:
    def test_dense_quantized_close_and_same_tree(self):
        """quantized=True keeps the param tree and stays close in probs."""
        from digipathai_tpu.models.registry import build_model

        be = build_model("dense", dtype=jnp.float32)
        bq = build_model("dense", dtype=jnp.float32, quantized=True)
        v = be.init(64)
        tq = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                    bq.init(64))
        te = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
        assert tq == te

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
        pe = np.asarray(be.apply(v, x))[..., 1]
        pq = np.asarray(bq.apply(v, x))[..., 1]
        # probabilities: deviations accumulate across ~60 quantized convs
        assert np.mean(np.abs(pe - pq)) < 0.05
        assert np.isfinite(pq).all()
