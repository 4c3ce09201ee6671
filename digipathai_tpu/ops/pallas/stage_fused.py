"""Whole-decoder-stage fused Pallas kernel: upsample2x + convA + convB.

Round-2 finding (BASELINE.md): a per-conv Pallas kernel wins 1.14x over
XLA standalone but LOSES 33% in-model — the custom-call boundary at every
narrow full-resolution tensor forces padded-lane relayouts and blocks XLA's
graph fusions (the upsample2x that otherwise fuses into the conv input read
materializes).  This kernel therefore fuses an ENTIRE U-Net decoder stage

    a   = relu(bnA(conv3x3(upsample2x(y), kA) + biasA))
    out = relu(bnB(conv3x3(concat([a, skip]), kB) + biasB))

into ONE pallas_call, so the custom-call boundaries sit at the stage's
*interface* tensors only: the quarter-area pre-upsample input, the skip, and
the stage output.  The two full-resolution intermediates (the upsampled
input and the convA activation) live and die in VMEM.

How the upsample is folded (exact, nearest-neighbor):

- rows: a 3x3 conv on a 2x-row-upsampled tensor collapses to TWO taps per
  output row parity on the half-res rows — parity 0 sees [k0, k1+k2],
  parity 1 sees [k0+k1, k2] (upsampled rows are duplicates).  convA is
  computed as two half-height "phase planes" (6 MXU dots each) that are
  re-interleaved by a leading-dimension stack+reshape, which Mosaic lowers
  without intra-tile shuffles.
- cols: the half-res input strip is column-duplicated once in VMEM
  (``jnp.repeat``, one VPU pass over the quarter-area strip); the three
  column taps then read it at unit offsets exactly like a standard conv.

This cuts convA FLOPs to 6/9 of the naive upsample-then-conv form on top of
removing ~2 full-resolution HBM round-trips per stage.  convB runs as the
round-2 kernel's proven 9-accumulated-dots pattern against the VMEM-staged
convA output plus (when present) the DMA'd skip strip — the concat is never
materialized (the kernel is split into its ``a``/``skip`` channel blocks).

DMA/layout rules honored (see memory note "axon-tpu-environment"): HBM
strips are sliced 128-aligned on the lane (channel) dim — inputs are
zero-channel-padded, with matching zero kernel rows so results are exact —
and 16-aligned on the sublane (column) dim; row slices are unconstrained.
Input strips are double-buffered across sequential grid cells.

Border semantics are exactly SAME-padding's: convA phase planes computed in
the halo are masked to zero outside the real tensor before convB consumes
them, reproducing the canonical zero padding of both convs.

Numerics: taps accumulate in f32 on the MXU like XLA's conv; the only
deviation from the canonical composition is that duplicate-row kernel taps
are pre-summed (k1+k2) before the bf16 weight cast instead of accumulated
per-tap, a <=1-ulp difference pinned by tests/test_stage_fused.py.

Reference ops being replaced: the decoder stages of
``reference DigiPathAI/models/densenet.py:123-155`` / ``inception.py:246-268``
(UpSampling2D + conv_block + concatenate + conv_block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PADC = 16  # column (sublane-dim) halo allocation; extents must be 16-aligned


def _kernel(y_hbm, s_hbm, ka_ref, kba_ref, kbs_ref, affa_ref, affb_ref,
            out_ref, ybuf, sbuf, ubuf, abuf, ysem, ssem, *,
            R, WC, Cp, Csp, F, H, W, relu):
    R2, WC2 = R // 2, WC // 2
    WPA = WC + _PADC
    has_skip = sbuf is not None
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    step = i * nj + j
    total = pl.num_programs(0) * nj
    slot = jax.lax.rem(step, 2)

    def ydma(slot_, row, col):
        return pltpu.make_async_copy(
            y_hbm.at[pl.ds(row * R2, R2 + 2), pl.ds(col * WC2, WC2 + _PADC)],
            ybuf.at[slot_], ysem.at[slot_])

    def sdma(slot_, row, col):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(row * R, R + 2), pl.ds(col * WC, WC + _PADC)],
            sbuf.at[slot_], ssem.at[slot_])

    def start(slot_, row, col):
        ydma(slot_, row, col).start()
        if has_skip:
            sdma(slot_, row, col).start()

    @pl.when(step == 0)
    def _():
        start(slot, i, j)

    nxt = step + 1

    @pl.when(nxt < total)
    def _():
        start(jax.lax.rem(nxt, 2), nxt // nj, jax.lax.rem(nxt, nj))

    ydma(slot, i, j).wait()

    # column-duplicate the half-res strip once (VPU pass over quarter area);
    # strip col u covers full col j*WC - 2 + u after duplication, so the
    # repeat's phase matches the global upsample phase (block starts even).
    ubuf[:] = jnp.repeat(ybuf[slot], 2, axis=1)

    # convA as two row-phase planes: plane row p covers full row i*R + 2p
    # (even phase) / i*R + 2p - 1 (odd phase); both read strip rows p + ty.
    planes = []
    for py in range(2):
        acc = None
        for ty in range(2):
            for dx in range(3):
                a = ubuf[ty:ty + R2 + 1, dx:dx + WPA, :].reshape(
                    (R2 + 1) * WPA, Cp)
                d = jnp.dot(a, ka_ref[py * 6 + ty * 3 + dx],
                            preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
        acc = acc * affa_ref[0] + affa_ref[1]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        planes.append(acc.reshape(R2 + 1, WPA, F))

    # interleave rows (leading-dim stack+reshape: no intra-tile shuffle):
    # af[r] covers full row i*R - 1 + r, col cl covers full col j*WC - 1 + cl
    af = jnp.stack([planes[1], planes[0]], axis=1).reshape(R + 2, WPA, F)
    # SAME-padding parity: zero the halo wherever it falls outside the real
    # tensor (canonical convB sees zero padding there, not convA output)
    rr = jax.lax.broadcasted_iota(jnp.int32, (R + 2, WPA), 0) + i * R - 1
    cc = jax.lax.broadcasted_iota(jnp.int32, (R + 2, WPA), 1) + j * WC - 1
    valid = (rr >= 0) & (rr < H) & (cc >= 0) & (cc < W)
    # multiply by a float {0,1} mask instead of jnp.where: a lane-broadcast
    # bool select crashes the Mosaic compiler (HTTP 500 from the compile
    # helper — bisected round 3); the product is exact for finite values
    abuf[:] = (af * valid.astype(af.dtype)[..., None]).astype(abuf.dtype)

    if has_skip:
        sdma(slot, i, j).wait()

    acc = None
    for dy in range(3):
        for dx in range(3):
            a = abuf[dy:dy + R, dx:dx + WC, :].reshape(R * WC, F)
            d = jnp.dot(a, kba_ref[dy * 3 + dx],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
            if has_skip:
                s = sbuf[slot, dy:dy + R, dx:dx + WC, :].reshape(R * WC, Csp)
                acc = acc + jnp.dot(s, kbs_ref[dy * 3 + dx],
                                    preferred_element_type=jnp.float32)
    acc = acc * affb_ref[0] + affb_ref[1]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(R, WC, F).astype(out_ref.dtype)


def _affine(bias, mul, add, f):
    mul_ = jnp.ones((f,), jnp.float32) if mul is None else mul
    off = jnp.zeros((f,), jnp.float32) if add is None else add
    if bias is not None:
        off = off + bias * mul_
    return jnp.stack([mul_, off]).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("relu", "block_rows",
                                             "block_cols", "interpret"))
def fused_up_stage(y, ka, biasa, mula, adda, kb, biasb, mulb, addb,
                   skip=None, *, relu=True, block_rows: int = 32,
                   block_cols: int = 128, interpret=None):
    """One fused U-Net decoder stage (see module docstring).

    y: (1, Hh, Wh, C); ka: (3, 3, C, F); skip: (1, 2Hh, 2Wh, Cs) or None;
    kb: (3, 3, F + Cs, F); bias*/mul*/add*: (F,) f32 or None.  Returns
    (1, 2Hh, 2Wh, F) in y.dtype.  ``interpret=None`` auto-selects the Pallas
    interpreter off-TPU (CPU tests exercise the same code path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, hh, wh, c = y.shape
    f = ka.shape[-1]
    assert n == 1, "fused_up_stage expects a single supertile (N=1)"
    R, WC = block_rows, block_cols
    assert R % 2 == 0 and WC % 32 == 0
    R2, WC2 = R // 2, WC // 2
    H, W = 2 * hh, 2 * wh
    HB = -(-H // R)
    WB = -(-W // WC)
    cp = -(-c // 128) * 128

    yp = jnp.pad(y[0], ((1, HB * R2 + 2 - 1 - hh),
                        (1, WB * WC2 + _PADC - 1 - wh), (0, cp - c)))
    # row-phase-combined convA kernel: (2 py, 2 ty, 3 dx, Cp, F)
    kap = jnp.pad(ka, ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    ka2 = jnp.stack([
        jnp.stack([kap[0], kap[1] + kap[2]]),
        jnp.stack([kap[0] + kap[1], kap[2]]),
    ]).reshape(12, cp, f).astype(y.dtype)

    has_skip = skip is not None
    if has_skip:
        cs = skip.shape[-1]
        assert kb.shape[2] == f + cs
        csp = -(-cs // 128) * 128
        sp = jnp.pad(skip[0], ((1, HB * R + 2 - 1 - H),
                               (1, WB * WC + _PADC - 1 - W), (0, csp - cs)))
        kbs = jnp.pad(kb[:, :, f:, :], ((0, 0), (0, 0), (0, csp - cs),
                                        (0, 0)))
        kbs = kbs.reshape(9, csp, f).astype(y.dtype)
    else:
        assert kb.shape[2] == f
        csp = 0
    kba = kb[:, :, :f, :].reshape(9, f, f).astype(y.dtype)

    affa = _affine(biasa, mula, adda, f)
    affb = _affine(biasb, mulb, addb, f)

    body = functools.partial(
        _kernel, R=R, WC=WC, Cp=cp, Csp=csp, F=f, H=H, W=W, relu=relu)
    if has_skip:
        def kernel(y_hbm, s_hbm, ka_ref, kba_ref, kbs_ref, affa_ref,
                   affb_ref, out_ref, ybuf, sbuf, ubuf, abuf, ysem, ssem):
            body(y_hbm, s_hbm, ka_ref, kba_ref, kbs_ref, affa_ref, affb_ref,
                 out_ref, ybuf, sbuf, ubuf, abuf, ysem, ssem)
    else:
        def kernel(y_hbm, ka_ref, kba_ref, affa_ref, affb_ref, out_ref,
                   ybuf, ubuf, abuf, ysem):
            body(y_hbm, None, ka_ref, kba_ref, None, affa_ref, affb_ref,
                 out_ref, ybuf, None, ubuf, abuf, ysem, None)

    wspec = lambda s: pl.BlockSpec(s, lambda i, j: (0,) * len(s),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [yp]
    if has_skip:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(sp)
    in_specs.append(wspec((12, cp, f)))
    args.append(ka2)
    in_specs.append(wspec((9, f, f)))
    args.append(kba)
    if has_skip:
        in_specs.append(wspec((9, csp, f)))
        args.append(kbs)
    in_specs += [wspec((2, f)), wspec((2, f))]
    args += [affa, affb]

    scratch = [pltpu.VMEM((2, R2 + 2, WC2 + _PADC, cp), y.dtype)]
    if has_skip:
        scratch.append(pltpu.VMEM((2, R + 2, WC + _PADC, csp), y.dtype))
    scratch += [
        pltpu.VMEM((R2 + 2, WC + 2 * _PADC, cp), y.dtype),   # ubuf (col-dup)
        pltpu.VMEM((R + 2, WC + _PADC, f), y.dtype),         # abuf (convA out)
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if has_skip:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    out = pl.pallas_call(
        kernel,
        grid=(HB, WB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, WC, f), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HB * R, WB * WC, f), y.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[None, :H, :W, :]
