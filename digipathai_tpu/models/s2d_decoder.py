"""Exact space-to-depth U-Net decoder (the TPU-first fast path).

Problem (measured, tools/mxu_probe.py on v5e): MXU conv efficiency
collapses at low channel counts — 3x3 convs run at ~8% of bf16 peak with 64
channels and ~14% with 96, vs ~45-67% at 256-512. The reference U-Net
decoders (``reference DigiPathAI/models/densenet.py:110-159``,
``inception.py:169-271``) spend most of their FLOPs exactly there: 64-96
channel 3x3 convs at full slide resolution.

Fix: run each decoder stage at HALF its nominal resolution in a
space-to-depth (s2d) representation, where every tensor (N, H, W, C)
becomes (N, H/2, W/2, 4C) with channel layout (row-phase a, col-phase b, c).
The two stage convolutions become:

- ``upsample2x + conv3x3(C->F)``  ==  conv3x3(C -> 4F) on the half-res
  input with the kernel ``W_A[a,s,d]``-combined from the canonical kernel
  (nearest-upsampled pixels are duplicates, so K taps collapse per phase:
  SAME FLOPs, 4x the output channels -> ~4x the MXU efficiency).
- ``conv3x3(C->F)`` on a full-res tensor  ==  conv3x3(4C -> 4F) on its s2d
  form with a phase-structured kernel (structural zeros; 4x FLOPs but run
  at 4x the channel width, which is still a net win at these widths).

Both rewrites are EXACT (including SAME zero padding at borders): the
transformed kernels are built inside the forward pass from the SAME
canonical parameters, so trained checkpoints, the h5 converter, and the
parameter tree are untouched. BN/bias/relu apply on a (..., 4, C) view with
the canonical per-C parameters. See tests/test_s2d_decoder.py for the
bit-parity checks.

Where it pays: only the NARROW stages. The conv-B rewrite is 4x the FLOPs,
so it wins only while the canonical conv's MXU efficiency is <~25% of the
4x-width version's (64-96ch stages: measured 1.4-4x net). At 128ch+ the
canonical conv is already efficient and s2d is a net loss (measured:
all-stage s2d took dense 462 -> 374 eq-pps; last-2-stages is the sweet
spot).
Callers pick the cut with ``s2d_stages`` (count from the END of the
decoder).
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

# T[a, s, d]: phase-a contribution of canonical tap d (di = d-1) to the
# fused upsample-conv tap s (on the half-res grid).
_T = np.zeros((2, 3, 3), np.float32)
_T[0, 0, 0] = 1  # a=0: u[i-1] <- K[-1]
_T[0, 1, 1] = 1  # a=0: u[i]   <- K[0]
_T[0, 1, 2] = 1  # a=0: u[i]   <- K[+1]   (upsampled duplicate)
_T[1, 1, 0] = 1  # a=1: u[i]   <- K[-1]
_T[1, 1, 1] = 1  # a=1: u[i]   <- K[0]
_T[1, 2, 2] = 1  # a=1: u[i+1] <- K[+1]

# U[a, s, p, d]: output phase a reads input phase p at half-res tap s with
# canonical tap d (for a stride-1 3x3 conv with both sides in s2d form).
_U = np.zeros((2, 3, 2, 3), np.float32)
_U[0, 0, 1, 0] = 1  # a=0: x[2i-1] = (p=1, i-1) <- K[-1]
_U[0, 1, 0, 1] = 1  # a=0: x[2i]   = (p=0, i)   <- K[0]
_U[0, 1, 1, 2] = 1  # a=0: x[2i+1] = (p=1, i)   <- K[+1]
_U[1, 1, 0, 0] = 1  # a=1: x[2i]   = (p=0, i)   <- K[-1]
_U[1, 1, 1, 1] = 1  # a=1: x[2i+1] = (p=1, i)   <- K[0]
_U[1, 2, 0, 2] = 1  # a=1: x[2i+2] = (p=0, i+1) <- K[+1]


def upsample_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) canonical -> (3, 3, C, 4F) fused upsample2x+conv kernel."""
    c, f = k.shape[2], k.shape[3]
    w = jnp.einsum("asd,bte,decf->stcabf", _T, _T, k)
    return w.reshape(3, 3, c, 4 * f)


def s2d_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) canonical -> (3, 3, 4C, 4F) s2d-domain conv kernel."""
    c, f = k.shape[2], k.shape[3]
    w = jnp.einsum("aspd,btqe,decf->stpqcabf", _U, _U, k)
    return w.reshape(3, 3, 4 * c, 4 * f)


def head_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, F) canonical 1x1 head -> (1, 1, 4C, 4F) phase-diagonal."""
    eye = np.eye(2, dtype=np.float32)
    w = jnp.einsum("pa,qb,cf->pqcabf", eye, eye, k[0, 0])
    return w.reshape(1, 1, 4 * k.shape[2], 4 * k.shape[3])


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major channel (a, b, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h2, 2 * w2, c)


class ConvParams(nn.Module):
    """Parameter container byte-compatible with ``nn.Conv`` (kernel+bias at
    the same pytree path/shapes) whose kernel we transform before use."""

    shape: tuple  # (kh, kw, in, out)
    kernel_init: object = nn.initializers.he_normal()
    use_bias: bool = True  # False matches nn.Conv(use_bias=False): no param

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape, jnp.float32)
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros,
                       (self.shape[-1],), jnp.float32)
        return k, b


class BNParams(nn.Module):
    """Parameter container byte-compatible with ``nn.BatchNorm`` (params
    'scale'/'bias' + batch_stats 'mean'/'var' at the same paths/shapes),
    returning the folded inference affine. The s2d decoder applies it as a
    flat elementwise op on tiled channels — no (..., 4, C) view, so XLA can
    fuse it into the conv epilogue instead of materializing padded 5-D
    copies (inference only; training uses the canonical decoder)."""

    features: int
    epsilon: float = 1e-3
    use_scale: bool = True  # False matches nn.BatchNorm(use_scale=False)

    @nn.compact
    def __call__(self):
        f = self.features
        mul = jnp.ones((f,), jnp.float32)
        if self.use_scale:
            mul = self.param("scale", nn.initializers.ones, (f,),
                             jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             nn.initializers.zeros, None, (f,), jnp.float32)
        var = self.variable("batch_stats", "var",
                            nn.initializers.ones, None, (f,), jnp.float32)
        mul = mul * jax.lax.rsqrt(var.value + self.epsilon)
        return mul, bias - mean.value * mul


def _conv(x, w, dtype):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)


def _tile4(v):
    """(F,) canonical channel vector -> (4F,) phase-major tiled."""
    return jnp.tile(v, 4)


def s2d_unet_decoder(conv5, skips, features, make_conv, make_bn,
                     make_head, num_classes, dtype):
    """Run the trailing U-Net decoder stages in the s2d domain.

    - ``conv5``: the stage input (original domain, half the first stage's
      nominal resolution).
    - ``skips``: original-domain skip tensors, one per stage that has one.
    - ``features``: per-stage widths, e.g. (96, 64) for the last 2 stages.
    - ``make_conv(cin, cout)``: returns the next decoder conv's canonical
      (3, 3, cin, cout) (kernel, bias) — must allocate names in the same
      order as the canonical decoder. ``make_bn(f)``: likewise, returning
      the BNParams inference affine (mul, add). ``make_head(cin)``:
      canonical (1, 1, cin, num_classes) head params.

    Everything stays flat NHWC (phase-major 4C channels) so BN/bias/relu
    fuse into the conv epilogues; the per-phase concat is avoided by
    splitting the conv-B kernel transform per input block instead.

    Returns softmax probabilities at full resolution (exactly the canonical
    decoder's output; inference only).

    Reference decoder being rewritten: ``reference
    DigiPathAI/models/densenet.py:123-155`` / ``inception.py:246-268``.
    """
    def affine(y, bias, mul, add):
        # relu(BN(conv_out + bias)) with the adds folded into one FMA
        m = _tile4(mul).astype(y.dtype)
        a = _tile4(bias * mul + add).astype(y.dtype)
        return nn.relu(y * m + a)

    y = conv5  # original domain at stage-1 half-res
    for i, f in enumerate(features):
        k, b = make_conv(y.shape[-1], f)
        mul, add = make_bn(f)
        y = affine(_conv(y, upsample_conv_kernel(k), dtype), b, mul, add)
        if i < len(skips):
            s = space_to_depth(skips[i]).astype(y.dtype)
            cy = y.shape[-1] // 4
            k, b = make_conv(cy + s.shape[-1] // 4, f)
            mul, add = make_bn(f)
            # block-concat input: transform the kernel per input block so
            # no per-phase channel interleave of the tensors is needed
            w = jnp.concatenate([s2d_conv_kernel(k[:, :, :cy, :]),
                                 s2d_conv_kernel(k[:, :, cy:, :])], axis=2)
            y = affine(_conv(jnp.concatenate([y, s], axis=-1), w, dtype),
                       b, mul, add)
        else:
            k, b = make_conv(y.shape[-1] // 4, f)
            mul, add = make_bn(f)
            y = affine(_conv(y, s2d_conv_kernel(k), dtype), b, mul, add)
        if i + 1 < len(features):
            # next stage's fused upsample-conv consumes the original domain
            y = depth_to_space(y)

    hk, hb = make_head(y.shape[-1] // 4)
    logits = _conv(y, head_kernel(hk), dtype) + _tile4(hb).astype(dtype)
    logits = depth_to_space(logits)
    return nn.softmax(logits.astype(jnp.float32), axis=-1)
