"""Pallas TPU kernel for the CRF's truncated-window bilateral message.

The jnp reference implementation (``digipathai_tpu.ops.crf._bilateral_message``)
materializes (2r+1)^2 - 1 shifted copies of Q and the image in HBM — for
r=10 that is 440 full-array reads/writes per mean-field iteration.  This
kernel keeps a row-strip of the padded arrays in VMEM and accumulates the
whole shift window on-chip: each strip is read from HBM exactly once per
iteration.

TPU layout notes (Mosaic alignment rules shape the design):
- planar channel-first arrays, width padded to a lane multiple (128): DMA
  slices then only cut the sublane (row) dimension;
- horizontal shifts are lane ``pltpu.roll``s — wrap-around columns land in
  the zero-validity padding, so they contribute w = 0;
- vertical shifts are static sublane slices (python-unrolled dy loop).

A validity plane rides as the 4th image channel so border pixels normalize
over their true neighborhoods (border-exact, same as the jnp reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_hbm, f_hbm, out_ref, *, BH, Wp, r, strip_h, inv2_xy, inv2_c):
    row0 = pl.program_id(0) * BH

    def body(q_strip, f_strip, sem_q, sem_f):
        # strip_h = BH + 2r rounded up to the sublane tile (8) — Mosaic
        # requires DMA slice shapes aligned to the tiling
        cp_q = pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(row0, strip_h), :], q_strip, sem_q)
        cp_f = pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(row0, strip_h), :], f_strip, sem_f)
        cp_q.start()
        cp_f.start()
        cp_q.wait()
        cp_f.wait()

        num0 = jnp.zeros((BH, Wp), jnp.float32)
        num1 = jnp.zeros((BH, Wp), jnp.float32)
        den = jnp.zeros((BH, Wp), jnp.float32)

        def shift_body(k, carry):
            num0, num1, den = carry
            dy = k // (2 * r + 1)
            dx = k - dy * (2 * r + 1)
            # rows [dy, dy+BH): Mosaic needs 8-aligned sublane offsets, so
            # load the aligned (BH+8)-row window and roll by the remainder
            # (wrapped rows land beyond row BH and are sliced away)
            a8 = pl.multiple_of((dy // 8) * 8, 8)
            b = (BH + 8) - (dy - a8)  # positive-equivalent of roll by -(dy-a8)
            q_rows = pltpu.roll(
                q_strip[:, pl.ds(a8, BH + 8), :], b, 1)[:, 0:BH, :]
            f_rows = pltpu.roll(
                f_strip[:, pl.ds(a8, BH + 8), :], b, 1)[:, 0:BH, :]
            # roll right by (r - dx): col j reads j - (r-dx). Keep the shift
            # non-negative: negative dynamic lane rolls silently mis-lower
            # when the lane extent is a non-power-of-2 multiple of 128.
            shift = (r - dx + Wp) % Wp
            sq = pltpu.roll(q_rows, shift, 2)
            sf = pltpu.roll(f_rows, shift, 2)
            # center rows of this strip (recomputed per step: large values
            # captured as fori-loop constants mis-lower in Mosaic)
            a8c = pl.multiple_of((r // 8) * 8, 8)
            bc = (BH + 8) - (r - a8c)
            img_c = pltpu.roll(
                f_strip[:, pl.ds(a8c, BH + 8), :], bc, 1)[0:3, 0:BH, :]
            d2 = ((dy - r) ** 2 + (dx - r) ** 2).astype(jnp.float32)
            # explicit per-plane sum: a leading-axis reduce of a 3D vector
            # mis-lowers in Mosaic (wrong values, no error)
            color = ((img_c[0] - sf[0]) ** 2 + (img_c[1] - sf[1]) ** 2
                     + (img_c[2] - sf[2]) ** 2)
            w = jnp.exp(-d2 * inv2_xy - color * inv2_c) * sf[3]
            is_center = jnp.logical_and(dy == r, dx == r)
            w = jnp.where(is_center, 0.0, w)
            return (num0 + w * sq[0], num1 + w * sq[1], den + w)

        num0, num1, den = jax.lax.fori_loop(
            0, (2 * r + 1) ** 2, shift_body, (num0, num1, den))

        den = jnp.maximum(den, 1e-12)
        out_ref[0, :, :] = num0 / den
        out_ref[1, :, :] = num1 / den

    pl.run_scoped(
        body,
        q_strip=pltpu.VMEM((2, strip_h, Wp), jnp.float32),
        f_strip=pltpu.VMEM((4, strip_h, Wp), jnp.float32),
        sem_q=pltpu.SemaphoreType.DMA(()),
        sem_f=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("sigma_xy", "sigma_rgb", "r",
                                             "block_rows", "interpret"))
def bilateral_message_pallas(q, image, sigma_xy: float, sigma_rgb: float,
                             r: int = 10, block_rows: int = 64,
                             interpret: bool = False):
    """Bilateral message for (H, W, 2) Q given (H, W, 3) image.

    Drop-in replacement for ``crf._bilateral_message`` (same math, same
    self-exclusion and per-pixel normalization, border-exact).
    """
    h, w, _ = q.shape
    BH = block_rows
    n_strips = (h + BH - 1) // BH
    h_pad = n_strips * BH
    # strip must cover the largest aligned window: 8*floor(2r/8) + BH + 8
    strip_h = BH + 8 * ((2 * r) // 8 + 1)
    extra_rows = strip_h - (BH + 2 * r)
    Wp = ((w + 2 * r + 127) // 128) * 128
    inv2_xy = np.float32(0.5 / (sigma_xy * sigma_xy))
    inv2_c = np.float32(0.5 / (sigma_rgb * sigma_rgb))

    def to_planar(x):
        # (H, W, C) -> (C, rows, Wp) with the real data at rows [r, r+h)
        # and columns [r, r+w); bottom padding covers the last strip's DMA
        x = jnp.transpose(x.astype(jnp.float32), (2, 0, 1))
        return jnp.pad(x, ((0, 0),
                           (r, r + h_pad - h + extra_rows),
                           (r, Wp - w - r)))

    qp = to_planar(q)
    valid = to_planar(jnp.ones((h, w, 1), jnp.float32))
    fp = jnp.concatenate([to_planar(image), valid], axis=0)

    kernel = functools.partial(_kernel, BH=BH, Wp=Wp, r=r, strip_h=strip_h,
                               inv2_xy=inv2_xy, inv2_c=inv2_c)
    out = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, BH, Wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qp, fp)
    # planar padded -> (H, W, 2)
    return jnp.transpose(out[:, :h, r:r + w], (1, 2, 0))
