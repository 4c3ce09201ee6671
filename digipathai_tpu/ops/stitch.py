"""On-device overlap-add stitching of patch probabilities into supertiles.

The reference stitches per patch with a Python loop over disk memmaps —
its main CPU bottleneck (``reference DigiPathAI/Segmentation.py:164-177``).
Here the probability map is accumulated per *supertile* (a square region of
the slide plus a one-patch halo) in HBM, with a masked scatter-add done as a
``lax.scan`` of ``dynamic_update_slice`` ops; the host only receives one
finished supertile at a time and adds it into the full-slide memmap.

Patches are assigned to the supertile containing their top-left corner, so a
patch extends at most ``patch - 1`` pixels past the supertile on the + side:
the accumulator is (S + patch, S + patch) and halo rows/cols are added into
neighboring map regions by the host writeback (pure accumulation, so
cross-border contributions remain exact).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, donate_argnums=(0,), static_argnames=("patch",))
def stitch_batch(acc, mean_p, var_p, offsets, valid, *, patch: int):
    """Scatter-add a batch of patch stats into a supertile accumulator.

    Args:
      acc: (C, S+patch, S+patch) float32 — C=2 (mean-sum, var-sum; the count
        plane is recomputed analytically on the host from the patch plan) or
        C=3 (with an explicit count plane).
      mean_p: (B, patch, patch) float32 — per-patch ensemble-mean prob, ch 1.
      var_p: (B, patch, patch) float32 — per-patch ensemble variance, ch 1.
      offsets: (B, 2) int32 — (dx, dy) of each patch inside the accumulator.
      valid: (B,) bool — padding mask; invalid patches contribute nothing.

    Returns the updated accumulator (donated, so updated in place on TPU).
    """
    C = acc.shape[0]

    def body(acc, inp):
        m, v, off, ok = inp
        w = ok.astype(jnp.float32)
        dx, dy = off[0], off[1]
        win = lax.dynamic_slice(acc, (0, dx, dy), (C, patch, patch))
        planes = [m * w, v * w]
        if C == 3:
            planes.append(jnp.ones_like(m) * w)  # vma-safe (no full_like)
        upd = win + jnp.stack(planes, axis=0)
        return lax.dynamic_update_slice(acc, upd, (0, dx, dy)), None

    acc, _ = lax.scan(body, acc, (mean_p, var_p, offsets, valid))
    return acc


def make_accumulator(supertile: int, patch: int, planes: int = 3) -> jnp.ndarray:
    return jnp.zeros((planes, supertile + patch, supertile + patch), jnp.float32)


def add_counts_host(count_map, coords, valid, origin, patch: int):
    """Analytic count-plane accumulation on the host.

    ``count_map`` is the (Y, X) memmap; ``coords`` are level-0 (x, y) patch
    top-lefts.  Equivalent to stitching a ones-plane on device, minus the
    HBM->host transfer of a full accumulator plane.
    """
    import numpy as np

    Y, X = count_map.shape
    for (x, y), ok in zip(np.asarray(coords), np.asarray(valid)):
        if not ok:
            continue
        x0, y0 = int(x), int(y)
        count_map[y0:min(y0 + patch, Y), x0:min(x0 + patch, X)] += 1.0


def finalize_maps(mean_sum, var_sum, count):
    """count=0 -> 1, mean /= count, var /= count**2.

    Parity: ``reference DigiPathAI/Segmentation.py:175-177`` (including the
    quirky ``var / count**2``).
    """
    c = jnp.maximum(count, 1.0)
    return mean_sum / c, var_sum / (c * c)
