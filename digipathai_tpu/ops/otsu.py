"""Otsu thresholding in JAX.

Matches ``skimage.filters.threshold_otsu`` (256 bins over the data range,
returns the bin center below the argmax split) as used by the reference
tissue mask (``reference DigiPathAI/helpers/utils.py:340-344``).
"""

from __future__ import annotations

import jax.numpy as jnp


def otsu_threshold(x: jnp.ndarray, nbins: int = 256) -> jnp.ndarray:
    """Scalar Otsu threshold of ``x`` (any shape, any float/int dtype).

    Static-shape implementation: a fixed ``nbins`` histogram over
    [min, max] and a cumulative-moment sweep — no data-dependent shapes, so
    it jits and runs on TPU.
    """
    x = x.astype(jnp.float32).reshape(-1)
    lo = jnp.min(x)
    hi = jnp.max(x)
    span = jnp.maximum(hi - lo, 1e-12)
    # histogram
    idx = jnp.clip(((x - lo) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = jnp.zeros((nbins,), jnp.float32).at[idx].add(1.0)
    bin_centers = lo + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) * (span / nbins)

    # between-class variance sweep (skimage formulation)
    w1 = jnp.cumsum(hist)
    w2 = jnp.cumsum(hist[::-1])[::-1]
    m1 = jnp.cumsum(hist * bin_centers) / jnp.maximum(w1, 1e-12)
    m2 = (jnp.cumsum((hist * bin_centers)[::-1]) / jnp.maximum(w2[::-1], 1e-12))[::-1]
    # split between bin i and i+1
    var_between = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    i = jnp.argmax(var_between)
    return bin_centers[i]
