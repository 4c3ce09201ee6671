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

    def test_q_planes_sum_consistency(self):
        # Messages of [p, 1-p] sum to ~1 wherever the pixel has non-negligible
        # total bilateral weight.  A pixel whose every in-window neighbor is
        # color-distant (weights underflow; den clamped at 1e-12) does NOT
        # satisfy it — by design, the Gaussian message covers such pixels in
        # the CRF — so guard on the analytically computed weight.  A local
        # generator keeps the inputs independent of the session-scoped rng
        # stream (this test used to flake with test ordering).
        h = w = 48
        r, sxy, srgb = 3, 5.0, 20.0
        lrng = np.random.default_rng(7)
        img = lrng.integers(0, 255, (h, w, 3)).astype(np.float32)
        p = lrng.random((h, w)).astype(np.float32)
        q = np.stack([1 - p, p], axis=-1)
        out = np.asarray(bilateral_message_pallas(
            jnp.asarray(q), jnp.asarray(img), sxy, srgb, r=r, block_rows=16,
            interpret=True))

        den = np.zeros((h, w), np.float64)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy == 0 and dx == 0:
                    continue
                ty = slice(max(0, -dy), h - max(0, dy))
                tx = slice(max(0, -dx), w - max(0, dx))
                sy = slice(max(0, dy), h - max(0, -dy))
                sx = slice(max(0, dx), w - max(0, -dx))
                dc = img[sy, sx] - img[ty, tx]
                den[ty, tx] += np.exp(
                    -(dy * dy + dx * dx) / (2 * sxy ** 2)
                    - (dc * dc).sum(-1) / (2 * srgb ** 2))
        well_weighted = den > 1e-3
        assert well_weighted.mean() > 0.9  # the property must cover the bulk
        np.testing.assert_allclose(out.sum(-1)[well_weighted], 1.0, atol=1e-4)
