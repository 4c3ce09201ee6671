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


def add_counts_host(count_map, coords, valid, patch: int):
    """Analytic count-plane accumulation on the host, vectorized.

    ``count_map`` is the (Y, X) memmap; ``coords`` are ABSOLUTE level-0
    (x, y) patch top-lefts (no supertile-origin offset is applied).  Equivalent to stitching a ones-plane on device, minus the
    HBM->host transfer of a full accumulator plane.

    Each patch is a +1 rectangle, so the group's counts are a 2D difference
    array (four corner deltas per patch via ``np.add.at``) integrated with two
    in-place cumsums over the group's bounding region — O(region) work instead
    of the reference's per-patch slice-add loop, the SURVEY.md §3.3 bottleneck
    (``reference DigiPathAI/Segmentation.py:164-173``).
    """
    import numpy as np

    coords = np.asarray(coords)[np.asarray(valid, bool)]
    if coords.size == 0:
        return
    Y, X = count_map.shape
    xs = coords[:, 0].astype(np.int64)
    ys = coords[:, 1].astype(np.int64)
    x0r, y0r = int(xs.min()), int(ys.min())
    x1r = min(int(xs.max()) + patch, X)
    y1r = min(int(ys.max()) + patch, Y)
    H, W = y1r - y0r, x1r - x0r
    # interval deltas, patch extents clamped to the map bounds (+ side)
    ya, yb = ys - y0r, np.minimum(ys + patch, Y) - y0r
    xa, xb = xs - x0r, np.minimum(xs + patch, X) - x0r

    # Row-span decomposition: the count plane is piecewise-constant in y
    # between breakpoints (the set of patch start/end rows — for planner
    # grids, ~2 * supertile/stride values).  Build one 1D x-interval diff
    # profile per breakpoint, integrate the small (n_break, W) profile array
    # (both cumsums run over n_break * W elements, not H * W), then
    # broadcast-add each span's constant row into the map.  Total work is
    # O(region + n_patches) with no per-patch loop.
    bps = np.unique(np.concatenate([ya, yb]))
    if len(bps) * (W + 1) * 4 > (128 << 20):
        # pathological non-grid scatter: bound the profile array by splitting
        # the patch set at the median row and recursing (planner grids never
        # hit this — they have ~2 * supertile/stride breakpoints)
        lo = ys <= np.median(ys)
        ones = np.ones(len(coords), bool)
        add_counts_host(count_map, coords[lo], ones[lo], patch)
        add_counts_host(count_map, coords[~lo], ones[~lo], patch)
        return
    ia = np.searchsorted(bps, ya)
    ib = np.searchsorted(bps, yb)
    prof = np.zeros((len(bps), W + 1), np.float32)
    np.add.at(prof, (ia, xa), 1.0)
    np.add.at(prof, (ia, xb), -1.0)
    np.add.at(prof, (ib, xa), -1.0)
    np.add.at(prof, (ib, xb), 1.0)
    np.cumsum(prof, axis=0, out=prof)
    np.cumsum(prof, axis=1, out=prof)
    span_ends = np.append(bps[1:], H)
    region = count_map[y0r:y1r, x0r:x1r]
    for k in range(len(bps)):
        if bps[k] >= H:
            break
        region[bps[k]:span_ends[k]] += prof[k, :-1]


def finalize_maps(mean_sum, var_sum, count):
    """count=0 -> 1, mean /= count, var /= count**2.

    Parity: ``reference DigiPathAI/Segmentation.py:175-177`` (including the
    quirky ``var / count**2``).
    """
    c = jnp.maximum(count, 1.0)
    return mean_sum / c, var_sum / (c * c)


def get_mean_img(probs, count_map):
    """Per-pixel ensemble mean and variance of count-normalized maps.

    Parity target: ``get_mean_img`` (``reference DigiPathAI/helpers/
    utils.py:456-471``, dead code there) — stacks the per-model overlap-add
    maps, divides by the shared ``count_map``, and returns (mean, var)
    across the stack.  The reference body assigns the division result and
    then immediately overwrites it with a freshly zero-initialized memmap,
    so as written it returns all-zeros; the evident intent is implemented
    (PARITY.md deviations).  The live engine computes the same mean/var
    fused on device (``finalize_maps`` above); exposed by name for
    inventory parity.
    """
    import numpy as np

    probs = np.array(list(probs), dtype=np.float32)
    counts = np.maximum(np.asarray(count_map, np.float32), 1.0)[None, ...]
    probs = probs / counts
    return np.mean(probs, axis=0), np.var(probs, axis=0)
