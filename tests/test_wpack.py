"""Width-packed conv (ops/wpack.py): exactness vs the canonical conv."""

import numpy as np
import pytest

import jax.lax as lax
import jax.numpy as jnp

from digipathai_tpu.ops.wpack import tile_phase, wpack_conv, wpack_kernel


def canonical(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("p", [2, 4])
@pytest.mark.parametrize("shape", [(1, 12, 16, 5, 7), (2, 8, 8, 3, 3)])
def test_wpack_conv_exact(p, shape):
    n, h, w, c, f = shape
    rng = np.random.default_rng(p * 100 + h)
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (3, 3, c, f)), jnp.float32)
    ref = canonical(x, k)
    got = wpack_conv(x, k, p, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wpack_kernel_structure():
    """Packed kernel blocks are the canonical taps in the right slots."""
    c, f, p = 2, 3, 2
    k = jnp.asarray(np.random.default_rng(0).normal(0, 1, (3, 3, c, f)),
                    jnp.float32)
    w = np.asarray(wpack_kernel(k, p)).reshape(3, 3, p, c, p, f)
    kn = np.asarray(k)
    for dj in (-1, 0, 1):
        for a in range(p):
            for b in range(p):
                d = p * dj + a - b + 1
                block = w[:, dj + 1, a, :, b, :]
                if 0 <= d < 3:
                    np.testing.assert_array_equal(block, kn[:, d])
                else:
                    assert not block.any()


def test_wpack_border_exact():
    """SAME-padding borders match the canonical conv bit-for-bit."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (3, 3, 4, 4)), jnp.float32)
    ref = np.asarray(canonical(x, k))
    got = np.asarray(wpack_conv(x, k, 4, dtype=jnp.float32))
    np.testing.assert_allclose(got[:, :, :4], ref[:, :, :4], atol=1e-5)
    np.testing.assert_allclose(got[:, :, -4:], ref[:, :, -4:], atol=1e-5)


def test_tile_phase_layout():
    v = jnp.arange(3.0)
    np.testing.assert_array_equal(np.asarray(tile_phase(v, 2)),
                                  [0, 1, 2, 0, 1, 2])


def test_width_not_divisible_raises():
    x = jnp.zeros((1, 4, 6, 2))
    k = jnp.zeros((3, 3, 2, 2))
    with pytest.raises(AssertionError):
        wpack_conv(x, k, 4)


def test_pick_packing_rules():
    from digipathai_tpu.ops.wpack import pick_packing

    assert pick_packing(4352, 64, 64) == 4
    assert pick_packing(4352, 96, 64) == 2
    assert pick_packing(2176, 128, 96) == 2
    assert pick_packing(2176, 160, 96) == 0   # over max_lanes
    assert pick_packing(1088, 384, 128) == 0  # wide already
    assert pick_packing(63, 64, 64) == 0      # width not divisible
    assert pick_packing(4352, 64, 64, enabled=False) == 0


@pytest.mark.parametrize("model", ["dense", "inception"])
def test_wpack_model_exact(model):
    """wpack=True is an execution rewrite: same tree, same outputs."""
    import jax

    from digipathai_tpu.models.registry import build_model

    be = build_model(model, dtype=jnp.float32)
    bw = build_model(model, dtype=jnp.float32, wpack=True)
    v = be.init(64)
    tw = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                bw.init(64))
    te = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
    assert tw == te

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    pe = np.asarray(be.apply(v, x))
    pw = np.asarray(bw.apply(v, x))
    np.testing.assert_allclose(pw, pe, rtol=1e-4, atol=1e-5)
