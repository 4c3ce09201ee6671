"""Host-packed space-to-depth (s2d) model input: the stem lever.

The C=3 stride-2 stem convolutions are the single worst MXU citizens in all
three networks (XLA's narrow-channel conv pathology: dense stem 39.6 ms,
inception stem1 40.5 ms per tile-4096 forward; every XLA-level rewrite
measured as a loss — BASELINE.md round 3, tools/stem_probe*.py).  The only
winning form is a 2x2-space-to-depth-packed input — 12 channels at half
resolution — convolved with a re-indexed kernel (18.6-18.8 ms measured),
*provided the pack happens off the device*: the on-device s2d transform
costs 58 ms (tools/stem_probe2.py).

So the LOADER packs: a (H, W, 3) uint8 tile becomes (H/2, W/2, 12) with
channel layout ``(row-phase, col-phase, c)``, c minor.  Everything the
engine does to the input commutes:

- normalization is ``(x - 128) / 128`` — channel-uniform, unchanged;
- every dihedral TTA transform of the full-res tile equals a spatial
  transform of the packed tile plus a PHASE-CHANNEL PERMUTATION (even
  sides; measured to fuse into the stem conv's input read at ~3 ms,
  tools/stem_probe4.py — same cost class as full-res TTA);
- the stride-2 stem conv becomes a stride-1 conv over the packed grid with
  the kernel re-indexed per phase (``stem_kernel_s2d``) — EXACT, built
  inside the forward pass from the canonical parameters, so checkpoints
  and the parameter tree are untouched (models' ``s2d_stem`` flag).

Reference context: the stem convs replaced here implement the first layers
of ``reference DigiPathAI/models/densenet.py:110-159`` / ``inception.py`` /
``deeplabv3.py`` exactly.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp

from . import tta as tta_ops


def pack(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase layout (py, px, c), c minor.

    Works on jnp arrays (device) and np arrays (the loader's host path).
    H and W must be even.
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = xp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h // 2, w // 2, 4 * c)


def pack_host(tile_u8: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 host tile -> (H/2, W/2, 4C) uint8, C-contiguous."""
    return np.ascontiguousarray(pack(tile_u8[None])[0])


def _perm(py_swap: bool, px_swap: bool, transpose: bool, c: int):
    """Channel permutation for phase layout (py, px, c), c minor."""
    idx = []
    for py in (0, 1):
        for px in (0, 1):
            spy = 1 - py if py_swap else py
            spx = 1 - px if px_swap else px
            if transpose:
                spy, spx = spx, spy
            for ch in range(c):
                idx.append((spy * 2 + spx) * c + ch)
    return jnp.asarray(idx)


def apply_packed(batch: jnp.ndarray, tta: str) -> jnp.ndarray:
    """Packed-domain equivalent of ``tta.apply`` (same (B, X, Y, 4C) axes).

    Exact for even full-res sides: e.g. a flip of axis 2 maps full-res
    column 2J+px to W-1-2J-px = 2(W/2-1-J) + (1-px), i.e. a packed flip of
    axis 2 plus a col-phase swap.
    """
    c = batch.shape[-1] // 4
    if tta == tta_ops.FLIP_LEFT_RIGHT:
        return jnp.flip(batch, axis=2)[..., _perm(False, True, False, c)]
    if tta == tta_ops.ROTATE_90:
        y = jnp.flip(jnp.swapaxes(batch, 1, 2), axis=1)
        return y[..., _perm(True, False, True, c)]
    if tta == tta_ops.ROTATE_180:
        return jnp.flip(batch, axis=(1, 2))[..., _perm(True, True, False, c)]
    if tta == tta_ops.ROTATE_270:
        y = jnp.swapaxes(jnp.flip(batch, axis=1), 1, 2)
        return y[..., _perm(False, True, True, c)]
    return batch


def apply_chain_packed(batch: jnp.ndarray, chain: Sequence[str]):
    for t in chain:
        batch = apply_packed(batch, t)
    return batch


def stem_kernel_s2d(k: jnp.ndarray, pad_left: int):
    """Re-index a stride-2 full-res conv kernel for the packed input.

    For ``out(i) = sum_d x(2i + d - pad_left) K[d]`` (per axis), substitute
    ``x(2j + p) = X[j, p]``: with ``u = d - pad_left = 2m + p``, tap ``m``
    runs ``floor(-L/2) .. floor((kh-1-L)/2)``.  Returns ``(k2, pads)``:
    ``k2`` of shape (A, B, 4C, F) with
    ``k2[a, b, (py*2+px)*C + c, f] = K[2(a+m0y)+py+Ly, 2(b+m0x)+px+Lx, c, f]``
    (zero outside K's extent), and ``pads = ((ply, pry), (plx, prx))`` for a
    stride-1 VALID conv over the packed grid producing exactly the
    ceil(H/2) x ceil(W/2) stem output.
    """
    kh, kw, c, f = k.shape
    out = []
    pads = []
    taps = []
    for kk in (kh, kw):
        m0 = -((pad_left + 1) // 2)
        m1 = (kk - 1 - pad_left) // 2
        taps.append((m0, m1 - m0 + 1))
        pads.append((-m0, m1))
    (m0y, ay), (m0x, ax) = taps
    k2 = jnp.zeros((ay, ax, 2, 2, c, f), k.dtype)
    for a in range(ay):
        for py in (0, 1):
            d_y = 2 * (a + m0y) + py + pad_left
            if not 0 <= d_y < kh:
                continue
            for b in range(ax):
                for px in (0, 1):
                    d_x = 2 * (b + m0x) + px + pad_left
                    if not 0 <= d_x < kw:
                        continue
                    k2 = k2.at[a, b, py, px].set(k[d_y, d_x])
    return k2.reshape(ay, ax, 4 * c, f), tuple(pads)
