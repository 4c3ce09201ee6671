"""Pallas kernel tests (interpret mode on the CPU test topology)."""

import numpy as np
import pytest

import jax.numpy as jnp

from digipathai_tpu.ops.crf import _bilateral_message
from digipathai_tpu.ops.pallas.bilateral import bilateral_message_pallas


class TestBilateralKernel:
    @pytest.mark.parametrize("h,w,r,bh", [(50, 40, 3, 16), (70, 90, 10, 24),
                                          (64, 300, 5, 32)])
    def test_matches_jnp_reference(self, rng, h, w, r, bh):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        q = rng.random((h, w, 2)).astype(np.float32)
        ref = np.asarray(_bilateral_message(
            jnp.asarray(q), jnp.asarray(img), 5.0, 20.0, r))
        got = np.asarray(bilateral_message_pallas(
            jnp.asarray(q), jnp.asarray(img), 5.0, 20.0, r=r, block_rows=bh,
            interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_q_planes_sum_consistency(self, rng):
        # messages of [p, 1-p] should themselves sum to ~1 where weights > 0
        h = w = 48
        img = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        p = rng.random((h, w)).astype(np.float32)
        q = np.stack([1 - p, p], axis=-1)
        out = np.asarray(bilateral_message_pallas(
            jnp.asarray(q), jnp.asarray(img), 5.0, 20.0, r=3, block_rows=16,
            interpret=True))
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)
