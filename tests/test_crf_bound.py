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


class TestDoCrfTruncationBound:
    """VERDICT r4 item 4: bound ``do_crf``'s bilateral approximation the way
    the engine path's is bounded, at do_crf's own hyperparameters.

    Measured (tools/do_crf_bound_probe.py, seed 7; PARITY.md "Numerical
    deviations"): the per-MESSAGE deviation vs the exact dense operator is
    bimodal — near-exact away from label boundaries (random-pixel mean
    0.0036 at ds=4/r=20) but large AT boundaries (mean 0.22, p95 0.55),
    because a ds-cell color mean mixes the two sides' colors and srgb=13
    collapses its weights; widening the window (+-160 px) or the radius
    does NOT move the boundary number (it is smearing, not truncation).
    The metric that matters for a label-refinement function is label-level
    agreement after mean field vs the exact dense mean field: ds=8 (the
    engine default do_crf first shipped with) agrees 96.99% / lesion Dice
    0.912 (192^2, 5 iters); ds=4 agrees 98.41% / 0.956; ds=2 99.18% /
    0.975.  do_crf was therefore widened to ds=4, r=20 (same +-80 px =
    1 sigma_xy coverage, half the cell smearing).  Both facets pinned here
    at margins over the measured values.
    """

    SXY, SRGB, DS, R = 80.0, 13.0, 4, 20  # do_crf's params, ops/crf.py

    def test_do_crf_message_vs_exact_dense_512(self):
        import jax.numpy as jnp

        from tests.fixtures import render_he_like
        from digipathai_tpu.ops.crf import production_bilateral_message

        h = w = 512
        img, tissue, lesion = render_he_like(w, h, seed=7)
        rng = np.random.default_rng(7)
        # 3-label map like do_crf's callers would hold (bg/tissue/lesion),
        # q = softmax(-unary) at gt_prob 0.7: 0.7 on the label, 0.15 off
        labels = tissue.astype(np.int32) + lesion.astype(np.int32)
        q = np.full((h, w, 3), 0.15, np.float32)
        ys, xs = np.mgrid[0:h, 0:w]
        q[ys.ravel(), xs.ravel(), labels.ravel()] = 0.7
        q = np.asarray(q)

        sxy, srgb, ds, r = self.SXY, self.SRGB, self.DS, self.R
        m_prod = np.asarray(production_bilateral_message(
            jnp.asarray(q), jnp.asarray(img), sxy, srgb, ds, r))

        # exact dense message at sampled pixels, split boundary/random
        edge = np.abs(np.diff(labels.astype(np.float32), axis=0,
                              prepend=0)) > 0
        ey, ex = np.where(edge)
        idx = rng.choice(len(ey), size=min(128, len(ey)), replace=False)
        edge_samp = list(zip(ey[idx], ex[idx]))
        rand_samp = [(int(y), int(x))
                     for y, x in rng.integers(0, h, size=(64, 2))]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        imgf = img.astype(np.float32)
        qf = q.reshape(-1, 3)

        def errs_at(samples):
            errs = []
            for (sy, sx) in samples:
                d2 = (yy - sy) ** 2 + (xx - sx) ** 2
                c2 = ((imgf - imgf[sy, sx]) ** 2).sum(-1)
                wgt = np.exp(-d2 / (2 * sxy ** 2) - c2 / (2 * srgb ** 2))
                wgt[sy, sx] = 0.0
                m_exact = (wgt.ravel()[:, None] * qf).sum(0) / max(
                    wgt.sum(), 1e-12)
                errs.append(np.abs(m_prod[sy, sx] - m_exact).max())
            return np.asarray(errs)

        e_edge, e_rand = errs_at(edge_samp), errs_at(rand_samp)
        print(f"do_crf message deviation (ds={ds} r={r}): "
              f"boundary mean={e_edge.mean():.4f} "
              f"p95={np.percentile(e_edge, 95):.4f} | "
              f"random mean={e_rand.mean():.4f}")
        # measured (256/128-sample probe): boundary mean 0.2237 p95 0.5479;
        # random mean 0.0036 (max 0.38 — an occasional draw ON a boundary).
        # Pinned at ~2x (boundary) / ~6x (random, small-sample headroom):
        assert e_edge.mean() < 0.45
        assert np.percentile(e_edge, 95) < 0.80
        assert e_rand.mean() < 0.02

    def test_do_crf_label_agreement_vs_exact_dense_128(self):
        """Full 5-iteration production mean field (do_crf's real path and
        hyperparameters) vs an exact dense mean field on the same unary:
        same Potts update, same per-pixel message normalization, same
        (exact) Gaussian term, bilateral as a true all-pairs sum."""
        import jax
        import jax.numpy as jnp

        from tests.fixtures import render_he_like
        from digipathai_tpu.ops.crf import (_gaussian_message,
                                            _mean_field_from_unary)

        n, L, n_iters, gt_prob = 128, 3, 5, 0.7
        img, tissue, lesion = render_he_like(n, n, seed=7)
        labels = tissue.astype(np.int32) + lesion.astype(np.int32)
        p_e = -np.log(gt_prob)
        n_e = -np.log((1.0 - gt_prob) / (L - 1))
        unary = np.where(np.eye(L, dtype=np.float32)[labels] > 0,
                         p_e, n_e).astype(np.float32)

        q_prod = np.asarray(_mean_field_from_unary(
            jnp.asarray(img, jnp.uint8), jnp.asarray(unary), n_labels=L,
            n_iters=n_iters, enable_color=True, pos_sigma=3.0,
            compat_gaussian=3.0, bil_sigma_xy=self.SXY,
            bil_sigma_rgb=self.SRGB, bil_downsample=self.DS,
            bil_radius=self.R, compat_bilateral=10.0))

        # exact dense mean field (chunked all-pairs bilateral)
        ysf, xsf = np.mgrid[0:n, 0:n]
        ysf = ysf.ravel().astype(np.float32)
        xsf = xsf.ravel().astype(np.float32)
        imgf = img.reshape(-1, 3).astype(np.float32)
        n2 = (imgf ** 2).sum(1)
        inv_xy, inv_c = 0.5 / self.SXY ** 2, 0.5 / self.SRGB ** 2
        P = n * n
        q = np.asarray(jax.nn.softmax(-jnp.asarray(unary), axis=-1))
        for _ in range(n_iters):
            m_g = np.asarray(_gaussian_message(jnp.asarray(q), 3.0))
            qf2 = q.reshape(-1, L)
            m_b = np.empty((P, L), np.float32)
            for i0 in range(0, P, 2048):
                i1 = min(P, i0 + 2048)
                d2 = ((ysf[i0:i1, None] - ysf[None, :]) ** 2
                      + (xsf[i0:i1, None] - xsf[None, :]) ** 2)
                c2 = (n2[i0:i1, None] + n2[None, :]
                      - 2.0 * (imgf[i0:i1] @ imgf.T))
                wgt = np.exp(-d2 * inv_xy - np.maximum(c2, 0.0) * inv_c)
                wgt[np.arange(i1 - i0), np.arange(i0, i1)] = 0.0
                m_b[i0:i1] = (wgt @ qf2) / np.maximum(
                    wgt.sum(1, keepdims=True), 1e-12)
            logits = -unary + 3.0 * m_g + 10.0 * m_b.reshape(n, n, L)
            q = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

        lab_prod, lab_exact = q_prod.argmax(-1), q.argmax(-1)
        agree = float((lab_prod == lab_exact).mean())
        inter = float(((lab_prod == 2) & (lab_exact == 2)).sum())
        dice_lesion = 2 * inter / max(
            float((lab_prod == 2).sum() + (lab_exact == 2).sum()), 1.0)
        print(f"do_crf label agreement vs exact dense (128^2, 5 iters): "
              f"agree={agree:.4f} lesion_dice={dice_lesion:.4f} "
              f"mean|dQ|={np.abs(q_prod - q).mean():.4f}")
        # measured: agree 0.9763, lesion dice 0.8978, mean|dQ| 0.0160
        assert agree > 0.95
        assert dice_lesion > 0.82
        assert np.abs(q_prod - q).mean() < 0.035
