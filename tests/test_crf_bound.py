"""Numeric bound on the CRF bilateral truncation (VERDICT round-1 weak 5).

ops/crf.py approximates the dense bilateral term with a truncated window at
a downsampled resolution (ConvCRF-style) instead of pydensecrf's
permutohedral lattice. This test quantifies that approximation against a
BRUTE-FORCE exact dense bilateral mean-field (every pixel pair, full-res,
same per-pixel normalization and Potts updates) on a synthetic H&E-like
patch, and pins the measured deviation so regressions surface.

Ten mean-field iterations drive Q to hard 0/1, so pixels near the decision
boundary flip entirely under any perturbation — max|dQ| saturates at ~1 and
is not a meaningful metric; the stable measures are the thresholded-mask
Dice, the flipped-pixel fraction, and mean|dQ|. Measured on the 96x96
fixture (seed 0): Dice = 0.9777, flipped = 1.2% of pixels, mean|dQ| =
0.0119, all concentrated at the lesion boundary. PARITY.md records these.
"""

import numpy as np
import pytest


def exact_dense_crf(image_u8, probs_fg, n_iters=10, pos_sigma=10.0,
                    bil_sigma_xy=50.0, bil_sigma_rgb=20.0,
                    compat_gaussian=3.0, compat_bilateral=10.0):
    """Reference mean-field with an exact O(N^2) dense bilateral message."""
    import jax.numpy as jnp

    from digipathai_tpu.ops.crf import _gaussian_message

    h, w = probs_fg.shape
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    pos = np.stack([yy.ravel(), xx.ravel()], 1).astype(np.float32)
    col = image_u8.reshape(n, 3).astype(np.float32)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    c2 = ((col[:, None, :] - col[None, :, :]) ** 2).sum(-1)
    W = np.exp(-d2 / (2 * bil_sigma_xy ** 2) - c2 / (2 * bil_sigma_rgb ** 2))
    np.fill_diagonal(W, 0.0)
    den = np.maximum(W.sum(1, keepdims=True), 1e-12)

    q = np.stack([1.0 - probs_fg, probs_fg], -1).astype(np.float32)
    u = -np.log(np.clip(q, 1e-5, 1.0))
    for _ in range(n_iters):
        m_gauss = np.asarray(_gaussian_message(jnp.asarray(q), pos_sigma))
        m_bil = (W @ q.reshape(n, 2)) / den
        logits = (-u + compat_gaussian * m_gauss
                  + compat_bilateral * m_bil.reshape(h, w, 2))
        e = np.exp(logits - logits.max(-1, keepdims=True))
        q = e / e.sum(-1, keepdims=True)
    return q[..., 1]


@pytest.fixture(scope="module")
def fixture_patch():
    rng = np.random.default_rng(0)
    h = w = 96
    # H&E-ish background with a darker lesion blob
    img = np.full((h, w, 3), 230, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 48) ** 2 + (xx - 44) ** 2) < 28 ** 2
    img[blob] = (150, 90, 160)
    img += rng.normal(0, 8, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    # noisy probability map roughly following the blob
    probs = np.clip(blob * 0.75 + rng.normal(0, 0.15, (h, w)), 0, 1)
    return img, probs.astype(np.float32)


class TestCrfTruncationBound:
    def test_windowed_vs_exact_dense(self, fixture_patch):
        import jax.numpy as jnp

        from digipathai_tpu.ops.crf import mean_field_crf

        img, probs = fixture_patch
        exact = exact_dense_crf(img, probs)
        approx = np.asarray(mean_field_crf(jnp.asarray(img),
                                           jnp.asarray(probs)))
        d = np.abs(exact - approx)
        me, de = exact >= 0.3, approx >= 0.3
        dice = 2 * (me & de).sum() / max(me.sum() + de.sum(), 1)
        flipped = (d > 0.5).mean()
        print(f"dice={dice:.5f} flipped={flipped:.4f} mean|dQ|={d.mean():.5f}")
        # pinned at ~2x the measured deviation (see module docstring)
        assert dice > 0.95
        assert flipped < 0.02
        assert d.mean() < 0.03

    def test_crf_sharpens_toward_lesion(self, fixture_patch):
        """Sanity: refinement moves the map toward the color blob."""
        import jax.numpy as jnp

        from digipathai_tpu.ops.crf import mean_field_crf

        img, probs = fixture_patch
        refined = np.asarray(mean_field_crf(jnp.asarray(img),
                                            jnp.asarray(probs)))
        yy, xx = np.mgrid[0:96, 0:96]
        blob = ((yy - 48) ** 2 + (xx - 44) ** 2) < 28 ** 2
        before = np.abs(probs - blob).mean()
        after = np.abs(refined - blob).mean()
        assert after < before


class TestSlideScaleBound:
    """VERDICT r2 item 5: the 96x96 dynamics bound above says nothing about
    slide scale, where the production config (bil_downsample=4, radius 10)
    truncates color interactions past ~40 px while sigma_xy=50 still gives
    pairs at 40-150 px significant weight.  An exact dense mean-field at
    1024^2 is O(N^2)=1e12 pairs -- infeasible -- so the bound is split:

    - iteration DYNAMICS deviation: pinned by the 96x96 exact test above;
    - per-MESSAGE operator deviation at true slide scale: the production
      bilateral message over a full 1024^2 fixture vs the mathematically
      exact dense message evaluated at sampled pixels (exact per sample:
      a weighted sum over ALL 1M pixels -- no truncation, no downsampling).

    Measured (seed 3, 384 samples): mean|dm| = 0.0024, p95 = 0.0032,
    max = 0.41 of a [0,1] message -- i.e. the production window captures
    the dense operator almost everywhere, with a thin tail at pixels whose
    same-color mass sits mostly beyond the 40 px window (the documented
    ConvCRF-style truncation cost, ops/crf.py docstring).  PARITY.md
    records these.
    """

    def test_production_message_vs_exact_dense_1024(self):
        import jax.numpy as jnp

        from tests.fixtures import render_he_like
        from digipathai_tpu.ops.crf import production_bilateral_message

        h = w = 1024
        img, tissue, lesion = render_he_like(w, h, seed=3)
        rng = np.random.default_rng(3)
        probs = np.clip(lesion * 0.75 + rng.normal(0, 0.15, (h, w)), 0, 1)
        q = np.stack([1.0 - probs, probs], -1).astype(np.float32)

        m_prod = np.asarray(production_bilateral_message(
            jnp.asarray(q), jnp.asarray(img)))

        # exact dense message at sampled pixels, biased toward the lesion
        # boundary where the message matters
        ys, xs = np.where(lesion)
        k = 256
        idx = rng.choice(len(ys), size=k, replace=False)
        samp = list(zip(ys[idx], xs[idx]))
        samp += [(int(y), int(x)) for y, x in
                 rng.integers(0, h, size=(128, 2))]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        imgf = img.astype(np.float32)
        qf = q.reshape(-1, 2)
        errs = []
        for (sy, sx) in samp:
            d2 = (yy - sy) ** 2 + (xx - sx) ** 2
            c2 = ((imgf - imgf[sy, sx]) ** 2).sum(-1)
            wgt = np.exp(-d2 / (2 * 50.0 ** 2) - c2 / (2 * 20.0 ** 2))
            wgt[sy, sx] = 0.0
            m_exact = (wgt.ravel()[:, None] * qf).sum(0) / max(wgt.sum(),
                                                               1e-12)
            errs.append(np.abs(m_prod[sy, sx] - m_exact).max())
        errs = np.asarray(errs)
        print(f"slide-scale message deviation: mean={errs.mean():.4f} "
              f"p95={np.percentile(errs, 95):.4f} max={errs.max():.4f}")
        # pinned at ~4x the measured values; a change that widens the
        # truncation (or breaks the downsample path) trips these
        assert errs.mean() < 0.01
        assert np.percentile(errs, 95) < 0.02
