"""Whole-stage fused Pallas kernel (ops/pallas/stage_fused.py) parity.

Runs in Pallas interpreter mode on CPU (tests force JAX_PLATFORMS=cpu); the
real-TPU rate is measured by tools/stage_fused_probe.py.  The kernel fuses
upsample2x + convA+BN+relu + skip-concat + convB+BN+relu of one U-Net
decoder stage (reference DigiPathAI/models/densenet.py:123-155).
"""

import numpy as np
import pytest

import jax.lax as lax
import jax.numpy as jnp


def up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def canonical(y, ka, ba, ma, aa, kb, bb, mb, ab, skip=None, relu=True):
    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    a = (conv(up2(y), ka) + ba) * ma + aa
    if relu:
        a = jnp.maximum(a, 0.0)
    b = jnp.concatenate([a, skip], -1) if skip is not None else a
    o = (conv(b.astype(y.dtype), kb) + bb) * mb + ab
    return jnp.maximum(o, 0.0) if relu else o


def rand_stage(rng, hh, wh, c, cs, f):
    y = jnp.asarray(rng.normal(0, 1, (1, hh, wh, c)), jnp.float32)
    ka = jnp.asarray(rng.normal(0, 0.3, (3, 3, c, f)), jnp.float32)
    kb = jnp.asarray(rng.normal(0, 0.3, (3, 3, f + cs, f)), jnp.float32)
    ba, bb = (jnp.asarray(rng.normal(0, 0.1, (f,)), jnp.float32)
              for _ in range(2))
    ma, mb = (jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
              for _ in range(2))
    aa, ab = (jnp.asarray(rng.normal(0, 0.1, (f,)), jnp.float32)
              for _ in range(2))
    skip = (jnp.asarray(rng.normal(0, 1, (1, 2 * hh, 2 * wh, cs)),
                        jnp.float32) if cs else None)
    return y, ka, ba, ma, aa, kb, bb, mb, ab, skip


# (hh, wh, c, cs, f): with/without skip, non-multiple-of-block extents that
# exercise the SAME-padding halo masks at every block edge
@pytest.mark.parametrize("shape", [(8, 12, 5, 3, 7), (16, 16, 8, 0, 6),
                                   (10, 18, 3, 4, 5)])
def test_fused_stage_matches_canonical(shape):
    from digipathai_tpu.ops.pallas.stage_fused import fused_up_stage

    hh, wh, c, cs, f = shape
    rng = np.random.default_rng(hh * 31 + c)
    y, ka, ba, ma, aa, kb, bb, mb, ab, skip = rand_stage(rng, hh, wh, c,
                                                         cs, f)
    ref = np.asarray(canonical(y, ka, ba, ma, aa, kb, bb, mb, ab, skip))
    got = np.asarray(fused_up_stage(y, ka, ba, ma, aa, kb, bb, mb, ab, skip,
                                    block_rows=4, block_cols=32,
                                    interpret=True))
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-4, atol=1e-4)


def test_fused_stage_no_relu():
    from digipathai_tpu.ops.pallas.stage_fused import fused_up_stage

    rng = np.random.default_rng(0)
    y, ka, ba, ma, aa, kb, bb, mb, ab, skip = rand_stage(rng, 6, 6, 4, 2, 5)
    ref = np.asarray(canonical(y, ka, ba, ma, aa, kb, bb, mb, ab, skip,
                               relu=False))
    got = np.asarray(fused_up_stage(y, ka, ba, ma, aa, kb, bb, mb, ab, skip,
                                    relu=False, block_rows=4, block_cols=32,
                                    interpret=True))
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model", ["dense", "inception"])
def test_fused_stages_model_parity(model):
    """fused_stages=2: same parameter tree, same outputs (inference)."""
    import jax

    from digipathai_tpu.models.registry import build_model

    be = build_model(model, dtype=jnp.float32)
    bf = build_model(model, dtype=jnp.float32, fused_stages=2)
    v = be.init(64)
    tf_ = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                 bf.init(64))
    te = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
    assert tf_ == te

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    pe = np.asarray(be.apply(v, x))
    pf = np.asarray(bf.apply(v, x))
    # row-duplicate kernel taps are pre-summed before the weight cast
    # (<= 1-ulp f32 deviation per tap; see stage_fused.py docstring)
    np.testing.assert_allclose(pf, pe, rtol=1e-4, atol=1e-4)


def test_fused_stages_batch_fallback():
    """batch > 1 (patch mode) silently falls back to the canonical decoder."""
    from digipathai_tpu.models.registry import build_model

    b = build_model("dense", dtype=jnp.float32, fused_stages=2)
    v = b.init(64)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    p = np.asarray(b.apply(v, x))
    assert p.shape == (2, 64, 64, 2)
    assert np.isfinite(p).all()
