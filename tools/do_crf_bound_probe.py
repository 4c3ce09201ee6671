"""Measure do_crf's bilateral-approximation error vs the exact dense CRF.

VERDICT r4 item 4: ``do_crf`` (reference ``helpers/utils.py:548-566``) runs
the windowed+downsampled bilateral at sxy=80, srgb=13, ds=8, r=10.  Two
measurements, recorded in PARITY.md:

1. **Per-message operator bound** (512^2 H&E fixture, do_crf's exact
   hyperparameters): production message vs the mathematically exact dense
   message at sampled pixels, reported SPLIT into label-boundary samples and
   uniform-random samples.  Boundary pixels are the worst case for the
   ds-grid (an 8px cell mean mixes colors across the label edge; at srgb=13
   the mixed color is far from both sides, collapsing its weights), so the
   blended statistic of an edge-biased sample set is dominated by them.

2. **Label-level agreement** (192^2 fixture, exact dense is O(N^2) so
   feasible only at small N): the FULL 5-iteration production mean field
   (``_mean_field_from_unary``, do_crf's real code path and hyperparameters)
   vs an exact dense mean field on the same unary — same Potts update,
   same per-pixel message normalization, same (exact) Gaussian term, the
   bilateral computed as a true all-pairs sum.  Metrics: argmax agreement
   fraction, per-label Dice, mean |dQ|.  Also run at ds=4 and ds=2 to see
   whether widening buys anything at the label level.

Run:  python tools/do_crf_bound_probe.py [--skip-message]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tests.fixtures import render_he_like  # noqa: E402
from digipathai_tpu.ops.crf import (  # noqa: E402
    _gaussian_message, _mean_field_from_unary, production_bilateral_message)

SXY, SRGB, DS, R = 80.0, 13.0, 8, 10     # ops/crf.py do_crf hyperparameters
POS_SIGMA, COMPAT_G, COMPAT_B = 3.0, 3.0, 10.0
GT_PROB, N_ITERS, L = 0.7, 5, 3


def make_fixture(n: int, seed: int = 7):
    img, tissue, lesion = render_he_like(n, n, seed=seed)
    labels = tissue.astype(np.int32) + lesion.astype(np.int32)
    return img, labels


def unary_from_labels(labels: np.ndarray) -> np.ndarray:
    """do_crf's unary (zero_unsure=False branch): gt_prob 0.7 Potts unary."""
    p = -np.log(GT_PROB)
    n = -np.log((1.0 - GT_PROB) / (L - 1))
    one_hot = np.eye(L, dtype=np.float32)[labels]
    return np.where(one_hot > 0, p, n).astype(np.float32)


def exact_dense_bilateral(qf, imgf, ys, xs, chunk=2048):
    """All-pairs normalized bilateral message, self excluded. (P, L)."""
    P = qf.shape[0]
    n2 = (imgf ** 2).sum(1)
    out = np.empty((P, L), np.float32)
    inv_xy = 0.5 / SXY ** 2
    inv_c = 0.5 / SRGB ** 2
    for i0 in range(0, P, chunk):
        i1 = min(P, i0 + chunk)
        d2 = ((ys[i0:i1, None] - ys[None, :]) ** 2
              + (xs[i0:i1, None] - xs[None, :]) ** 2)
        c2 = n2[i0:i1, None] + n2[None, :] - 2.0 * (imgf[i0:i1] @ imgf.T)
        w = np.exp(-d2 * inv_xy - np.maximum(c2, 0.0) * inv_c)
        w[np.arange(i1 - i0), np.arange(i0, i1)] = 0.0
        out[i0:i1] = (w @ qf) / np.maximum(w.sum(1, keepdims=True), 1e-12)
    return out


def exact_dense_mean_field(img, unary, n):
    """Exact dense mean field: production's (exact) Gaussian term + true
    all-pairs bilateral, same Potts update as _mean_field_from_unary."""
    ys, xs = np.mgrid[0:n, 0:n]
    ys = ys.ravel().astype(np.float32)
    xs = xs.ravel().astype(np.float32)
    imgf = img.reshape(-1, 3).astype(np.float32)
    q = np.asarray(jax.nn.softmax(-jnp.asarray(unary), axis=-1))
    for it in range(N_ITERS):
        t0 = time.time()
        m_g = np.asarray(_gaussian_message(jnp.asarray(q), POS_SIGMA))
        m_b = exact_dense_bilateral(q.reshape(-1, L), imgf, ys, xs)
        logits = -unary + COMPAT_G * m_g + COMPAT_B * m_b.reshape(n, n, L)
        q = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        print(f"  dense iter {it + 1}/{N_ITERS}: {time.time() - t0:.1f}s",
              flush=True)
    return q


def production_mean_field(img, unary, ds, r=R):
    q = _mean_field_from_unary(
        jnp.asarray(img, jnp.uint8), jnp.asarray(unary), n_labels=L,
        n_iters=N_ITERS, enable_color=True, pos_sigma=POS_SIGMA,
        compat_gaussian=COMPAT_G, bil_sigma_xy=SXY, bil_sigma_rgb=SRGB,
        bil_downsample=ds, bil_radius=r, compat_bilateral=COMPAT_B)
    return np.asarray(q)


def dice(a, b):
    inter = float(np.logical_and(a, b).sum())
    return 2.0 * inter / max(float(a.sum() + b.sum()), 1.0)


def message_bound(n=512, seed=7, n_edge=256, n_rand=128, ds=DS, r=R):
    img, labels = make_fixture(n, seed)
    rng = np.random.default_rng(seed)
    q = np.full((n, n, L), 0.15, np.float32)
    ysg, xsg = np.mgrid[0:n, 0:n]
    q[ysg.ravel(), xsg.ravel(), labels.ravel()] = GT_PROB

    t0 = time.time()
    m_prod = np.asarray(production_bilateral_message(
        jnp.asarray(q), jnp.asarray(img), SXY, SRGB, ds, r))
    print(f"production message ({n}^2): {time.time() - t0:.1f}s", flush=True)

    edge = np.abs(np.diff(labels.astype(np.float32), axis=0, prepend=0)) > 0
    ey, ex = np.where(edge)
    idx = rng.choice(len(ey), size=min(n_edge, len(ey)), replace=False)
    edge_samp = list(zip(ey[idx], ex[idx]))
    rand_samp = [(int(y), int(x)) for y, x in rng.integers(0, n, (n_rand, 2))]

    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
    imgf = img.astype(np.float32)
    qf = q.reshape(-1, L)

    def errs_at(samples):
        errs = []
        for (sy, sx) in samples:
            d2 = (yy - sy) ** 2 + (xx - sx) ** 2
            c2 = ((imgf - imgf[sy, sx]) ** 2).sum(-1)
            w = np.exp(-d2 / (2 * SXY ** 2) - c2 / (2 * SRGB ** 2))
            w[sy, sx] = 0.0
            m_exact = (w.ravel()[:, None] * qf).sum(0) / max(w.sum(), 1e-12)
            errs.append(np.abs(m_prod[sy, sx] - m_exact).max())
        return np.asarray(errs)

    for name, samp in (("boundary", edge_samp), ("random", rand_samp)):
        e = errs_at(samp)
        print(f"message deviation [{name} x{len(samp)}] "
              f"(sxy={SXY:g} srgb={SRGB:g} ds={ds} r={r}): "
              f"mean={e.mean():.4f} p95={np.percentile(e, 95):.4f} "
              f"max={e.max():.4f}", flush=True)


def label_agreement(n=192, seed=7, configs=((8, 10), (4, 10), (2, 10))):
    img, labels = make_fixture(n, seed)
    unary = unary_from_labels(labels)
    print(f"exact dense mean field ({n}^2, {N_ITERS} iters)...", flush=True)
    q_exact = exact_dense_mean_field(img, unary, n)
    lab_exact = q_exact.argmax(-1)
    for ds, r in configs:
        q_prod = production_mean_field(img, unary, ds, r)
        lab_prod = q_prod.argmax(-1)
        agree = float((lab_prod == lab_exact).mean())
        d_in = float(np.abs(q_prod - q_exact).mean())
        dices = [dice(lab_prod == c, lab_exact == c) for c in range(L)]
        print(f"label agreement ds={ds} r={r} (vs exact dense, {n}^2, "
              f"{N_ITERS} iters): agree={agree:.4f} "
              f"dice(bg/tissue/lesion)={dices[0]:.4f}/{dices[1]:.4f}/"
              f"{dices[2]:.4f} mean|dQ|={d_in:.4f}", flush=True)
        # also vs the input labels: how much refinement moved things
        print(f"  vs input labels: prod agree={float((lab_prod == labels).mean()):.4f} "
              f"exact agree={float((lab_exact == labels).mean()):.4f}",
              flush=True)


if __name__ == "__main__":
    if "--widened" in sys.argv:
        # the candidate widened config (ds=4, r=20: same +-80px coverage,
        # half the cell smearing) + the 128^2 numbers the in-suite test pins
        message_bound(ds=4, r=20)
        label_agreement(configs=((4, 20),))
        label_agreement(n=128, configs=((4, 20),))
        sys.exit(0)
    if "--skip-message" not in sys.argv:
        message_bound()
    label_agreement()
