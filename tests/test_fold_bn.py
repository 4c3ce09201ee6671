"""BN folding exactness tests across all three model families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digipathai_tpu.models.fold_bn import fold_batchnorm
from digipathai_tpu.models.registry import build_model


def _randomize_stats(variables, rng):
    """Make BN stats non-trivial so folding is actually exercised."""
    def visit(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = visit(v)
            else:
                a = np.asarray(v)
                if k == "var":
                    out[k] = (0.5 + rng.random(a.shape)).astype(a.dtype)
                elif k in ("mean", "bias", "scale"):
                    out[k] = rng.normal(0, 0.3, a.shape).astype(a.dtype)
                else:
                    out[k] = a
        return out
    return {coll: visit(variables[coll]) for coll in variables}


@pytest.mark.parametrize("name,min_folded", [
    ("dense", 11),       # stem conv1 + 10 decoder convs
    ("inception", 90),   # every conv2d_bn pair + decoder
    ("deeplabv3", 60),   # all named conv->BN pairs
])
def test_fold_exactness(rng, name, min_folded):
    b = build_model(name, dtype=jnp.float32)
    v = b.init(64, seed=2)
    v = _randomize_stats(v, rng)
    folded, n = fold_batchnorm(v)
    assert n >= min_folded, n
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    f = jax.jit(lambda vv, xx: b.apply(vv, xx))
    y0 = np.asarray(f(v, x))
    y1 = np.asarray(f(folded, x))
    np.testing.assert_allclose(y1, y0, atol=2e-4)
