"""Fused conv3x3 Pallas kernel (ops/pallas/conv_fused.py) vs lax conv.

Runs in Pallas interpreter mode on CPU (tests force JAX_PLATFORMS=cpu);
the real-TPU rate is measured by tools/conv_fused_probe.py.
"""

import numpy as np
import pytest

import jax.lax as lax
import jax.numpy as jnp


def canonical(x, k, bias, mul, add, relu=True):
    y = lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = (y + bias) * mul + add
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("shape", [(12, 24, 5, 7), (8, 512, 64, 64)])
def test_fused_conv_matches_lax(shape):
    from digipathai_tpu.ops.pallas.conv_fused import fused_conv3x3

    h, w, c, f = shape
    rng = np.random.default_rng(h + c)
    x = jnp.asarray(rng.normal(0, 1, (1, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, c, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (f,)), jnp.float32)
    mul = jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
    add = jnp.asarray(rng.normal(0, 0.1, (f,)), jnp.float32)
    ref = np.asarray(canonical(x, k, bias, mul, add))
    got = np.asarray(fused_conv3x3(x, k, bias, mul, add,
                                   block_rows=4, block_cols=128,
                                   interpret=True))
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("model", ["dense", "inception"])
def test_fused_decoder_model_exact(model):
    """fused_decoder=True: same parameter tree, same outputs (inference)."""
    import jax

    from digipathai_tpu.models.registry import build_model

    be = build_model(model, dtype=jnp.float32)
    bf = build_model(model, dtype=jnp.float32, fused_decoder=True)
    v = be.init(64)
    tf_ = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                 bf.init(64))
    te = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
    assert tf_ == te

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    pe = np.asarray(be.apply(v, x))
    pf = np.asarray(bf.apply(v, x))
    np.testing.assert_allclose(pf, pe, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(12, 24, 5, 7), (40, 300, 128, 32)])
def test_fused_conv_pre_activation(shape):
    """pre_mul/pre_add: relu(x*pm+pa) fused before the conv must match the
    canonical order (activation FIRST, then SAME zero-padding) — including
    at image borders where a shifted pre-activation would leak relu(pa)."""
    from digipathai_tpu.ops.pallas.conv_fused import fused_conv3x3

    h, w, c, f = shape
    rng = np.random.default_rng(c + f)
    x = jnp.asarray(rng.normal(0, 1, (1, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, c, f)), jnp.float32)
    pm = jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32)
    # strictly positive offsets: the border-leak case
    pa = jnp.asarray(rng.uniform(0.1, 0.5, (c,)), jnp.float32)
    hpre = jnp.maximum(x * pm + pa, 0.0)
    ref = np.asarray(canonical(hpre, k, jnp.zeros(f), jnp.ones(f),
                               jnp.zeros(f), relu=False))
    got = np.asarray(fused_conv3x3(x, k, relu=False, pre_mul=pm, pre_add=pa,
                                   block_rows=4, block_cols=128,
                                   interpret=True))
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)


def test_pallas_blocks_model_exact():
    """pallas_blocks=N: same parameter tree, same outputs — the encoder
    dense blocks' 3x3 convs route through the strip-DMA kernel with the
    pre-activation fused (densenet_unet.py dense_block_chunked)."""
    import jax

    from digipathai_tpu.models.registry import build_model

    be = build_model("dense", dtype=jnp.float32)
    bf = build_model("dense", dtype=jnp.float32, pallas_blocks=4)
    v = be.init(64)
    tf_ = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                 bf.init(64))
    te = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
    assert tf_ == te

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    pe = np.asarray(be.apply(v, x))
    pf = np.asarray(bf.apply(v, x))
    np.testing.assert_allclose(pf, pe, rtol=1e-4, atol=1e-4)


def test_fused_conv_no_relu_no_affine():
    from digipathai_tpu.ops.pallas.conv_fused import fused_conv3x3

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 16, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, 3, 4)), jnp.float32)
    ref = np.asarray(canonical(x, k, jnp.zeros(4), jnp.ones(4),
                               jnp.zeros(4), relu=False))
    got = np.asarray(fused_conv3x3(x, k, relu=False, block_rows=4,
                                   block_cols=16, interpret=True))
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
