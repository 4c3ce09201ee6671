"""Width-packed convolution: exact narrow-channel 3x3 convs at MXU widths.

Problem (measured, ``tools/mxu_probe.py`` / ``tools/decoder_conv_probe.py``):
XLA's TPU conv runs at ~8% of bf16 peak with 64 channels and ~14% with 96 —
and the U-Net decoders spend their FLOPs exactly there (full-resolution
64-96ch stages; ``reference DigiPathAI/models/densenet.py:110-159``).

Trick: NHWC is contiguous in (W, C), so viewing ``(H, W, C)`` as
``(H, W/P, P*C)`` — P adjacent pixels' channels stacked into the lane
dimension — is a FREE reinterpretation (pure reshape, no transpose; this is
what makes it cheaper than the 2x2 space-to-depth rewrite, whose row
interleaving is a real HBM pass).  A stride-1 SAME 3x3 conv on the
original tensor equals a stride-1 SAME 3x3 conv on the packed view with a
block-structured kernel

    B[dy, dj][p*C + ci, q*F + co] = K[dy, P*dj + p - q + 1][ci, co]
        (zero where the tap index P*dj + p - q + 1 is outside [0, 3))

because output pixel ``P*j + q`` reads input pixel ``P*(j+dj) + p`` at
horizontal tap ``dx = P*dj + p - q``.  SAME padding in the packed domain
pads whole packed columns of zeros, which only structurally-zero blocks
touch beyond the canonical one-pixel border — so the rewrite is EXACT
(including borders), for any P >= 2.

Cost/benefit: the packed conv runs P x the nominal FLOPs (the structural
zeros still occupy the MXU) but at P x the channel width, where conv
efficiency is several times higher; measured net wins on v5e are recorded
in BASELINE.md.  The kernel transform runs inside jit from the CANONICAL
parameters, so checkpoints and the parameter tree are untouched.
"""

from __future__ import annotations

import numpy as np

import jax.lax as lax
import jax.numpy as jnp


def wpack_kernel(k: jnp.ndarray, p: int) -> jnp.ndarray:
    """(3, 3, C, F) canonical -> (3, 3, P*C, P*F) width-packed kernel."""
    kh, kw, c, f = k.shape
    assert kh == 3 and kw == 3, "wpack supports 3x3 kernels"
    # S[dj, a, b, d]: output phase b reads input phase a at packed tap dj
    # with canonical horizontal tap d (= dx + 1).
    s = np.zeros((3, p, p, 3), k.dtype if isinstance(k, np.ndarray)
                 else np.float32)
    for dj in (-1, 0, 1):
        for a in range(p):
            for b in range(p):
                d = p * dj + a - b + 1
                if 0 <= d < 3:
                    s[dj + 1, a, b, d] = 1
    # k axes are (dy, dx, ci, co); contract S's canonical tap d with dx
    w = jnp.einsum("jabd,edcf->ejacbf", jnp.asarray(s, k.dtype), k)
    return w.reshape(3, 3, p * c, p * f)


def wpack_conv(x: jnp.ndarray, k: jnp.ndarray, p: int,
               dtype=None) -> jnp.ndarray:
    """Exact SAME stride-1 3x3 conv of NHWC ``x`` with ``k`` via W-packing.

    ``x``: (N, H, W, C) with W % p == 0; ``k``: (3, 3, C, F).
    Returns (N, H, W, F).
    """
    n, h, w, c = x.shape
    f = k.shape[-1]
    assert w % p == 0, f"width {w} not divisible by packing factor {p}"
    dtype = dtype or x.dtype
    xp = x.reshape(n, h, w // p, p * c)
    wk = wpack_kernel(k, p)
    yp = lax.conv_general_dilated(
        xp.astype(dtype), wk.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    return yp.reshape(n, h, w, f)


def tile_phase(v: jnp.ndarray, p: int) -> jnp.ndarray:
    """(F,) per-channel vector -> (P*F,) phase-major for the packed layout."""
    return jnp.tile(v, p)


def pick_packing(width: int, cin: int, cout: int, *, max_lanes: int = 256,
                 enabled: bool = True) -> int:
    """Packing factor for a stride-1 SAME 3x3 conv, or 0 to stay canonical.

    Packs only NARROW convs (min channel < 128 — wider ones already use the
    MXU well and the P x FLOP overhead would lose) up to ``max_lanes``
    packed channels (beyond ~2 MXU lanes the efficiency curve flattens
    while the overhead keeps growing).
    """
    if not enabled or min(cin, cout) >= 128:
        return 0
    for p in (4, 2):
        if width % p == 0 and p * cin <= max_lanes and p * cout <= max_lanes:
            return p
    return 0
