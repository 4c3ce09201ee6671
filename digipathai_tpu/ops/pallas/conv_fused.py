"""Fused 3x3 conv + bias + BN-affine + relu Pallas kernel (decoder stages).

Why: XLA's TPU conv lowering runs the U-Net decoders' narrow full-resolution
convs at ~8-14% of bf16 peak (``tools/mxu_probe.py``), and every XLA-level
restructuring we measured (s2d, int8, width-packing — see BASELINE.md) loses
its win to layout taxes. This kernel keeps the canonical NHWC HBM layout and
rebuilds the conv inside VMEM:

- each grid cell DMAs a TILE-ALIGNED input strip (16-row / 128-lane
  granularity — unaligned DMA shapes hit Mosaic slow paths) covering its
  (R, WC) output block plus the 3x3 halo,
- the 9 taps become 9 accumulated MXU dots ``(R*WC, C) @ (C, F)``; the
  row-slice per dy is a free leading-dim offset and the (R, WC, C) ->
  (R*WC, C) reshape is a free leading-dim merge, so there is no im2col
  materialization and no lane repacking,
- bias/BN-affine/relu fuse into the f32 epilogue on the VPU; bf16 store.

The kernel computes ``relu((conv(x, k) + bias) * mul + add)`` — pass
``mul=None/add=None`` for a plain conv+bias, ``relu=False`` to disable.
Numerics match the canonical conv up to bf16 rounding (f32 accumulation both
here and in XLA's conv); parity is pinned in ``tests/test_conv_fused.py``.

Reference ops being replaced: the decoder ``Conv2D 3x3 same + BN + ReLU``
blocks (``reference DigiPathAI/models/densenet.py:37-48``,
``inception.py:36-47``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PADR = 16   # row-halo allocation, bf16 sublane tile
_PADW = 16   # col-halo allocation; cols are the SUBLANE dim, 16-aligned (bf16)


def _kernel(x_hbm, kp_ref, aff_ref, pre_ref, out_ref, strips, sems, *, R, WC,
            C, F, relu, pre, H, W):
    # Input strips are double-buffered across grid steps: scratch persists
    # between sequential grid cells on the core, so each step prefetches
    # the NEXT cell's strip while computing its own (the serial-DMA version
    # measured ~6 ms DMA against ~5.5 ms of compute at 2048^2).
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    step = i * nj + j
    total = pl.num_programs(0) * nj
    slot = jax.lax.rem(step, 2)

    def get_dma(slot_, row, col):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(row * R, R + _PADR), pl.ds(col * WC, WC + _PADW)],
            strips.at[slot_], sems.at[slot_])

    @pl.when(step == 0)
    def _():
        get_dma(slot, i, j).start()

    nxt = step + 1
    ni = nxt // nj
    njx = jax.lax.rem(nxt, nj)

    @pl.when(nxt < total)
    def _():
        get_dma(jax.lax.rem(nxt, 2), ni, njx).start()

    get_dma(slot, i, j).wait()
    if pre:
        # Input-side BN-affine + relu (dense-layer pre-activation), applied
        # once per strip in place — same bf16 elementwise arithmetic as the
        # canonical XLA path.  The canonical path pads AFTER the activation,
        # so out-of-image strip positions (SAME halo + alignment padding,
        # where relu(0*pm + pa) would leak max(pa, 0)) are re-zeroed via a
        # float mask (bool selects broadcast poorly on the VPU lanes).
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (R + _PADR, WC + _PADW, 1), 0) + i * R
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (R + _PADR, WC + _PADW, 1), 1) + j * WC
        inside = ((rows >= 1) & (rows < H + 1)
                  & (cols >= 1) & (cols < W + 1))
        h = jnp.maximum(
            strips[slot] * pre_ref[0].astype(strips.dtype)
            + pre_ref[1].astype(strips.dtype), 0)
        strips[slot] = (h * inside.astype(strips.dtype)).astype(strips.dtype)
    y = None
    for dy in range(3):
        for dx in range(3):
            # dynamic slot index + static subslices lower as addressing —
            # do NOT read the whole strip into a value (that's a VPU copy)
            a = strips[slot, dy:dy + R, dx:dx + WC, :].reshape(R * WC, C)
            d = jnp.dot(a, kp_ref[3 * dy + dx],
                        preferred_element_type=jnp.float32)
            y = d if y is None else y + d
    y = y * aff_ref[0] + aff_ref[1]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(R, WC, F).astype(out_ref.dtype)


def _pick_cols(w: int, lo: int = 128, hi: int = 320) -> int:
    """Column-block width: a 16-multiple (bf16 sublane tile) minimizing the
    grid's right-edge padding, preferring wider blocks on ties.  E.g. 1088
    -> 272 (zero pad) where a fixed 256 would pad 1088 -> 1280."""
    best, best_key = lo, None
    for wc in range(lo, hi + 1, 16):
        wp = -(-w // wc) * wc
        key = (wp - w, -wc)
        if best_key is None or key < best_key:
            best, best_key = wc, key
    return best


@functools.partial(jax.jit, static_argnames=("relu", "block_rows",
                                             "block_cols", "interpret"))
def fused_conv3x3(x, k, bias=None, mul=None, add=None, *, relu=True,
                  pre_mul=None, pre_add=None,
                  block_rows: int = 16, block_cols: int = 0,
                  interpret=None):
    """``relu((conv3x3_same(x, k) + bias) * mul + add)`` via Pallas.

    x: (N, H, W, C) bf16/f32; k: (3, 3, C, F) f32; bias/mul/add: (F,) f32
    or None. Returns (N, H, W, F) in x.dtype. N must be 1 (the engine's
    tile path); vmap for batches. ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (CPU tests exercise the same code path).

    ``pre_mul``/``pre_add`` (shape (C,)) apply an input-side
    ``relu(x * pre_mul + pre_add)`` before the conv — the dense-layer
    pre-activation (BN-affine + relu), fused into the strip load so the
    activation tensor never makes an extra HBM pass
    (models/densenet_unet.py dense_block_chunked).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    f = k.shape[-1]
    assert n == 1, "fused_conv3x3 expects a single supertile (N=1)"
    R, WC = block_rows, block_cols or _pick_cols(w)
    hp = -(-h // R) * R
    wp = -(-w // WC) * WC

    # 1-px SAME halo at top/left; bottom/right padded out to the aligned
    # strip allocation (rows i*R .. i*R+R+_PADR must stay in bounds).
    # Channels pad to a 128-lane multiple: Mosaic requires DMA slices to be
    # lane-tile aligned, and the zero kernel rows keep the result exact.
    cp = -(-c // 128) * 128
    xp = jnp.pad(x[0], ((1, hp + _PADR - h - 1), (1, wp + _PADW - w - 1),
                        (0, cp - c)))
    kp = jnp.pad(k.astype(x.dtype), ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    kp = kp.reshape(3 * 3, cp, f)
    mul_ = jnp.ones((f,), jnp.float32) if mul is None else mul
    off = jnp.zeros((f,), jnp.float32) if add is None else add
    if bias is not None:
        off = off + bias * mul_
    aff = jnp.stack([mul_, off]).astype(jnp.float32)  # (2, F)
    pre = pre_mul is not None or pre_add is not None
    pm = jnp.ones((c,), jnp.float32) if pre_mul is None else pre_mul
    pa = jnp.zeros((c,), jnp.float32) if pre_add is None else pre_add
    # pad the pre-affine so the zero-padded lanes stay zero through relu
    pre_aff = jnp.stack([jnp.pad(pm, (0, cp - c)),
                         jnp.pad(pa, (0, cp - c))]).astype(jnp.float32)

    grid = (hp // R, wp // WC)
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, WC=WC, C=cp, F=f, relu=relu,
                          pre=pre, H=h, W=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cp, f), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, WC, f), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, R + _PADR, WC + _PADW, cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, kp, aff, pre_aff)
    return out[None, :h, :w, :]
