"""Bilinear resize with TF1 ``align_corners=True`` semantics.

The reference's DeepLabv3+ upsamples with
``tf.compat.v1.image.resize(..., align_corners=True)``
(``reference DigiPathAI/models/deeplabv3.py:385,420,443``).
``jax.image.resize`` implements the half-pixel convention, which differs, so
this op reproduces the align-corners sampling exactly: source position
``i * (in - 1) / (out - 1)``, linear interpolation, per axis.

Output sizes are static, so index/weight tables are computed in numpy at
trace time and become XLA constants — the op lowers to two gathers and two
FMAs per axis, fusing cleanly on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _axis_tables(n_in: int, n_out: int):
    if n_out <= 1 or n_in <= 1:
        i0 = np.zeros(n_out, np.int32)
        i1 = np.zeros(n_out, np.int32)
        w1 = np.zeros(n_out, np.float32)
    else:
        pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
        i0 = np.floor(pos).astype(np.int32)
        i1 = np.minimum(i0 + 1, n_in - 1).astype(np.int32)
        w1 = (pos - i0).astype(np.float32)
    return i0, i1, w1


def resize_bilinear_align_corners(x: jnp.ndarray,
                                  out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize (B, H, W, C) or (B, H, W) along axes 1-2, align_corners=True.

    The rank-3 form exists for the binary-head path: a (B, H, W) map has no
    channel axis for the TPU tiled layout to pad to 128 lanes, so resizing
    it moves ~64x less HBM traffic than the (B, H, W, 2) equivalent.
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[1], x.shape[2]
    tail = x.ndim - 3  # trailing channel axis present?
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    i0, i1, w1 = _axis_tables(h, oh)
    w1r = jnp.asarray(w1).reshape((1, -1) + (1,) * (1 + tail))
    xf = xf[:, i0] * (1.0 - w1r) + xf[:, i1] * w1r

    j0, j1, v1 = _axis_tables(w, ow)
    v1r = jnp.asarray(v1).reshape((1, 1, -1) + (1,) * tail)
    xf = xf[:, :, j0] * (1.0 - v1r) + xf[:, :, j1] * v1r
    return xf.astype(dtype)
