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


def unpack(x):
    """Inverse of one ``pack`` level: (B, H, W, 4C) -> (B, 2H, 2W, C)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    b, h, w, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, h, w, 2, 2, c)
    y = xp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, 2 * h, 2 * w, c)


def pack_n(x, level: int):
    """Apply ``pack`` ``level`` times: (B, H, W, C) -> (B, H/P, W/P, P^2*C)
    with P = 2**level.  The channel layout is the NESTED one (each level's
    phase pair is major over the previous level's channels)."""
    for _ in range(level):
        x = pack(x)
    return x


def unpack_n(x, level: int):
    for _ in range(level):
        x = unpack(x)
    return x


def pack_host(tile_u8: np.ndarray, level: int = 1) -> np.ndarray:
    """(H, W, C) uint8 host tile -> (H/P, W/P, P^2*C) uint8, C-contiguous."""
    return np.ascontiguousarray(pack_n(tile_u8[None], level)[0])


def _layout_codes(level: int, c: int) -> np.ndarray:
    """Map the nested packed-channel layout to flat phase codes.

    Returns ``codes`` of length P^2*c with ``codes[ch] = (ry*P + rx)*c + cc``
    where full-res position = ``P*i + r`` per axis (P = 2**level).  Built
    numerically by packing a code-valued array, so it is correct for any
    nesting by construction.
    """
    P = 1 << level
    codes = np.arange(P * P * c).reshape(1, P, P, c)
    return np.asarray(pack_n(codes, level))[0, 0, 0]


def _phase_base(level: int, c: int):
    """(P, P) array of packed-channel base offsets: channel index of
    (ry, rx, cc=0); the c channels of one phase are contiguous."""
    P = 1 << level
    codes = _layout_codes(level, c)
    inv = np.empty_like(codes)
    inv[codes] = np.arange(codes.size)
    return inv.reshape(P, P, c)[:, :, 0]


def _perm(py_swap: bool, px_swap: bool, transpose: bool, c: int,
          level: int = 1):
    """Channel permutation for the nested phase layout at ``level``."""
    P = 1 << level
    codes = _layout_codes(level, c)
    inv = np.empty_like(codes)
    inv[codes] = np.arange(codes.size)
    perm = np.empty(codes.size, np.int64)
    for ch, code in enumerate(codes):
        ry, rx, cc = code // (P * c), (code // c) % P, code % c
        spy = P - 1 - ry if py_swap else ry
        spx = P - 1 - rx if px_swap else rx
        if transpose:
            spy, spx = spx, spy
        perm[ch] = inv[(spy * P + spx) * c + cc]
    return jnp.asarray(perm)


def apply_packed(batch: jnp.ndarray, tta: str, level: int = 1):
    """Packed-domain equivalent of ``tta.apply`` (same (B, X, Y, P^2*C)
    axes): ``apply_packed(pack_n(x, L), t, L) == pack_n(tta.apply(x, t), L)``.

    Exact for full-res sides divisible by P: e.g. a flip of axis 2 maps
    full-res column P*J+px to W-1-P*J-px = P*(W/P-1-J) + (P-1-px), i.e. a
    packed flip of axis 2 plus a col-phase reversal.
    """
    c = batch.shape[-1] >> (2 * level)
    if tta == tta_ops.FLIP_LEFT_RIGHT:
        return jnp.flip(batch, axis=2)[..., _perm(False, True, False, c,
                                                  level)]
    if tta == tta_ops.ROTATE_90:
        y = jnp.flip(jnp.swapaxes(batch, 1, 2), axis=1)
        return y[..., _perm(True, False, True, c, level)]
    if tta == tta_ops.ROTATE_180:
        return jnp.flip(batch, axis=(1, 2))[..., _perm(True, True, False, c,
                                                       level)]
    if tta == tta_ops.ROTATE_270:
        y = jnp.swapaxes(jnp.flip(batch, axis=1), 1, 2)
        return y[..., _perm(False, True, True, c, level)]
    return batch


def apply_chain_packed(batch: jnp.ndarray, chain: Sequence[str],
                       level: int = 1):
    for t in chain:
        batch = apply_packed(batch, t, level)
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


def conv_kernel_packed(k, stride: int, pad_left: int, level: int):
    """Generalized ``stem_kernel_s2d``: re-index a full-res conv kernel so
    the conv runs stride-1 over an input packed at ``level``, producing an
    output packed at ``level - log2(stride)``.

    Full-res semantics (per axis): ``out(o) = sum_d x(stride*o + d -
    pad_left) K[d]``.  With ``P = 2**level`` and ``Q = P // stride``, output
    index ``o = Q*I + q`` reads input ``P*I + (stride*q + d - pad_left)``;
    writing ``stride*q + d - pad_left = P*m + r`` maps each (out-phase q,
    tap d) to one (packed tap m, in-phase r).

    Returns ``(k2, pads, level_out)``: ``k2`` of shape
    ``(A, B, P^2*C, Q^2*F)`` with the NESTED channel layouts of
    ``pack_n`` on both sides (``Q == 1`` means an unpacked output), and
    ``pads`` for a stride-1 conv over the packed grid.  Entries not hit by
    any (q, d) pair are structural zeros — the MXU computes them densely,
    trading a bounded FLOP inflation (= P^2/stride^2 net of the spatial
    shrink) for full 128-lane K/N occupancy, which is the whole point: the
    narrow stem convs run ~5-20x below even their lane-capped MXU bound
    (BASELINE.md round 3, tools/stem_probe3.py).
    """
    P = 1 << level
    assert P % stride == 0, (P, stride)
    Q = P // stride
    lvl_out = level - (stride.bit_length() - 1)
    kh, kw, c, f = k.shape

    def axis_meta(kk):
        u_min = -pad_left
        u_max = stride * (Q - 1) + kk - 1 - pad_left
        m0 = u_min // P if u_min >= 0 else -((-u_min + P - 1) // P)
        m1 = u_max // P if u_max >= 0 else -((-u_max + P - 1) // P)
        return m0, m1

    (m0y, m1y), (m0x, m1x) = axis_meta(kh), axis_meta(kw)
    ay, ax = m1y - m0y + 1, m1x - m0x + 1
    pads = ((-m0y, m1y), (-m0x, m1x))
    base_in = _phase_base(level, c)
    base_out = (_phase_base(lvl_out, f) if Q > 1
                else np.zeros((1, 1), np.int64))

    def taps(q, kk, m0):
        for d in range(kk):
            u = stride * q + d - pad_left
            m = u // P if u >= 0 else -((-u + P - 1) // P)
            yield m - m0, u - P * m, d

    k2 = jnp.zeros((ay, ax, P * P * c, Q * Q * f), k.dtype)
    for qy in range(Q):
        for a, ry, dy in taps(qy, kh, m0y):
            for qx in range(Q):
                for b, rx, dx in taps(qx, kw, m0x):
                    bi = int(base_in[ry, rx])
                    bo = int(base_out[qy, qx])
                    k2 = k2.at[a, b, bi:bi + c, bo:bo + f].set(k[dy, dx])
    return k2, pads, lvl_out


def bn_packed(v, level: int):
    """Tile a per-feature affine vector across the P^2 phases of a packed
    tensor (the nested layout is phase-major, feature-minor)."""
    return jnp.tile(v, 1 << (2 * level))


def maxpool3s2_consume(y, pad_before: int, pad_value: float):
    """3x3/2 max pool on the full-res grid, computed on a LEVEL-1 packed
    tensor, consuming the packing: (B, H2, W2, 4C) -> (B, H2, W2, C).

    ``pad_before`` is the full-res left/top padding (0 for XLA SAME on even
    inputs, 1 for an explicit pad-1 + VALID pool); ``pad_value`` is what
    that padding holds (-inf for SAME reduce_window, 0.0 for a zero pad —
    equivalent after a relu).  Separable: rows then columns; each axis is
    ``max(phase0', phase1', shifted-phase)`` per the phase algebra
    (out(o) = max over x(2o - pad_before + {0,1,2}))."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    v = y.reshape(b, h, w, 2, 2, c)

    def axis_max(p0, p1, axis):
        if pad_before == 0:
            # max(p0[o], p1[o], p0[o+1])
            shifted = jnp.concatenate(
                [jax_slice(p0, axis, 1, None),
                 jnp.full(_edge_shape(p0, axis), pad_value, p0.dtype)], axis)
            return jnp.maximum(jnp.maximum(p0, p1), shifted)
        # pad_before == 1: max(p1[o-1], p0[o], p1[o])
        shifted = jnp.concatenate(
            [jnp.full(_edge_shape(p1, axis), pad_value, p1.dtype),
             jax_slice(p1, axis, 0, -1)], axis)
        return jnp.maximum(jnp.maximum(shifted, p0), p1)

    r = axis_max(v[:, :, :, 0], v[:, :, :, 1], 1)   # (b, h, w, 2, c)
    return axis_max(r[..., 0, :], r[..., 1, :], 2)  # (b, h, w, c)


def jax_slice(x, axis, lo, hi):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(lo, hi)
    return x[tuple(idx)]


def _edge_shape(x, axis):
    s = list(x.shape)
    s[axis] = 1
    return tuple(s)
