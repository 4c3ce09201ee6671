"""DenseNet-121 U-Net in flax, bfloat16 compute.

Architecture parity target: ``unet_densenet121``
(``reference DigiPathAI/models/densenet.py:110-159``): DenseNet-121 encoder
(blocks [6, 12, 24, 16], growth 32, 0.5 transitions, BN eps 1.001e-5) with a
5-stage nearest-upsample U-Net decoder (320/256/128/96/64, conv+BN(1e-3)+relu
blocks) and a 2-class softmax head.

Layer names mirror the Keras layer names ('/' -> '__') so the .h5 weight
converter (``digipathai_tpu.models.convert_h5``) can map checkpoints by name;
unnamed Keras decoder layers use Keras's auto-naming scheme
(conv2d, conv2d_1, ..., batch_normalization, ...).

TPU notes: all convs run in bfloat16 on the MXU with float32 params; the
softmax head is computed in float32. Shapes are fully static; no
data-dependent control flow, so the whole forward jits into one XLA module.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

BN_EPS_DENSE = 1.001e-5
BN_EPS_DECODER = 1e-3


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling (Keras UpSampling2D default)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class DenseNet121UNet(nn.Module):
    num_classes: int = 2
    growth: int = 32
    blocks: tuple = (6, 12, 24, 16)
    dtype: Any = jnp.bfloat16
    # Run the LAST s2d_stages decoder stages in the exact space-to-depth
    # form (same parameters, same outputs, faster on TPU where channels are
    # narrow — see models/s2d_decoder.py).
    s2d_decoder: bool = False
    s2d_stages: int = 2
    # int8 inference for the wide convs (opt-in, see models/quant.py)
    quantized: bool = False
    # exact width-packed decoder convs (opt-in, see ops/wpack.py)
    wpack: bool = False
    # Pallas fused decoder convs (opt-in, inference only; conv_fused.py)
    fused_decoder: bool = False
    # Pallas WHOLE-STAGE fusion (upsample+convA+convB per kernel) for the
    # LAST fused_stages decoder stages (inference, N=1; stage_fused.py)
    fused_stages: int = 0
    # MEASUREMENT ONLY: drop the last N decoder stages' convs (replaced by
    # upsample + channel slice so head shapes are preserved).  Used by the
    # bench to attribute in-model per-stage cost; never for real inference.
    trunc_last: int = 0
    # Chunked dense-block execution (inference only; exact — same params,
    # same math): features stay a LIST of ~128-ch packed buffers and each
    # layer's 1x1 conv is a sum of kernel-sliced partial convs, so the full
    # concat never re-materializes to HBM per layer and the contraction dim
    # stays 128-lane aligned.  Measured 1.4-1.9x per dense block on v5e
    # (tools/encoder_probe.py, round 3).  Canonical path in train mode
    # (BN batch stats) and under quantization.
    chunked_encoder: bool = True
    # Run the 3x3 convs of the FIRST pallas_blocks dense blocks through the
    # strip-DMA Pallas kernel with the pre-activation (BN-affine+relu) fused
    # into the strip load (ops/pallas/conv_fused.py).  The narrow-N
    # (C_out=32) encoder convs are the in-model MXU-efficiency sink
    # (BASELINE.md round-3 attribution); boundaries sit at the 128-ch
    # bottleneck tensors so no relayout tax applies.  Inference-only, N=1.
    pallas_blocks: int = 0
    # Tile-mode halo (px at full res, multiple of 32, >= 64): crop decoder
    # feature maps progressively so the halo fringe — whose outputs the
    # engine discards — is never computed above the bottleneck.  Receptive-
    # field-exact: each stage keeps margin >= 2 before its upsample (one px
    # per 3x3 conv), so the returned (H-2*halo_crop)^2 output is
    # bit-identical to the canonical forward's center crop.  Saves ~10% of
    # the two most expensive (highest-res) decoder stages at halo 128 /
    # tile 4096.  Inference only; 0 disables (patch mode).
    halo_crop: int = 0
    # Input arrives space-to-depth packed by the LOADER and the stem runs
    # on the packed grid with re-indexed kernels (ops/s2d_input.py).  Exact,
    # same parameters; kills the C=3 stem conv pathology.  Inference only.
    # Level 1: (N, H/2, W/2, 12) input, 7x7/2 stem -> stride-1 4x4 conv
    #   (39.6 -> ~19 ms per tile-4096 forward).
    # Level 2: (N, H/4, W/4, 48) input; the stem conv emits a LEVEL-1
    #   PACKED output (1088^2 x 256 at tile 4096: full 128-lane K/N
    #   occupancy instead of K=27/N=64), the BN+relu apply phase-tiled,
    #   and the 3x3/2 maxpool consumes the packing
    #   (``maxpool3s2_consume``); only the conv1 skip pays one unpack.
    s2d_stem: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 binary: bool = False) -> jnp.ndarray:
        """``binary=True`` (inference, 2 classes): return p(class 1) as a
        rank-3 (N, H, W) f32 map instead of the (N, H, W, 2) softmax —
        mathematically identical (sigmoid of the logit difference) and ~64x
        cheaper at the head on TPU tiled layouts (models/heads.py)."""
        from .quant import conv_ctor

        conv = partial(conv_ctor(False if train else self.quantized),
                       dtype=self.dtype, param_dtype=jnp.float32)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.99, dtype=self.dtype, param_dtype=jnp.float32)
        he = nn.initializers.he_normal()

        def dense_layer(x, name):
            y = bn(epsilon=BN_EPS_DENSE, name=f"{name}_0_bn")(x)
            y = nn.relu(y)
            y = conv(4 * self.growth, (1, 1), use_bias=False, name=f"{name}_1_conv")(y)
            y = bn(epsilon=BN_EPS_DENSE, name=f"{name}_1_bn")(y)
            y = nn.relu(y)
            y = conv(self.growth, (3, 3), padding="SAME", use_bias=False,
                     name=f"{name}_2_conv")(y)
            return jnp.concatenate([x, y], axis=-1)

        def dense_block(x, n, name, use_pallas=False):
            for i in range(n):
                x = dense_layer(x, f"{name}_block{i + 1}")
            return x

        def dense_block_chunked(x, n, name, use_pallas=False):
            """Exact chunked execution of ``dense_block`` (inference only).

            Same parameter tree (names/shapes/collections identical to the
            canonical path's nn.Conv/nn.BatchNorm), different schedule: the
            growing feature set is kept as a list of packed buffers and the
            per-layer 1x1 conv over the virtual concat is computed as a sum
            of kernel-sliced convs — linearity makes the partial-sum form
            mathematically identical, and no layer rewrites the whole
            concat to HBM (measured 1.4-1.9x/block: tools/encoder_probe.py).
            """
            from .s2d_decoder import BNParams, ConvParams

            lecun = nn.initializers.lecun_normal()
            dt = self.dtype
            chunks = [x]
            pend: list = []  # 32-ch layer outputs not yet packed

            def conv_p(xs, k, pet=None):
                import jax.lax as lax

                return lax.conv_general_dilated(
                    xs, k.astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=pet or dt)

            for i in range(n):
                ln = f"{name}_block{i + 1}"
                parts = chunks + pend
                C = sum(t.shape[-1] for t in parts)
                mul0, add0 = BNParams(C, epsilon=BN_EPS_DENSE,
                                      name=f"{ln}_0_bn")()
                k1, _ = ConvParams((1, 1, C, 4 * self.growth),
                                   kernel_init=lecun, use_bias=False,
                                   name=f"{ln}_1_conv")()
                # partial sums accumulate in f32 and round to the compute
                # dtype ONCE, matching the canonical single conv's rounding
                # regime (per-slice bf16 rounding would make the "same
                # math" claim false in the production bf16 path)
                acc = None
                off = 0
                for t in parts:
                    c = t.shape[-1]
                    h = nn.relu(t * mul0[off:off + c].astype(dt)
                                + add0[off:off + c].astype(dt))
                    p = conv_p(h, k1[:, :, off:off + c, :],
                               pet=jnp.float32)
                    acc = p if acc is None else acc + p
                    off += c
                acc = acc.astype(dt)
                mul1, add1 = BNParams(4 * self.growth, epsilon=BN_EPS_DENSE,
                                      name=f"{ln}_1_bn")()
                k2, _ = ConvParams((3, 3, 4 * self.growth, self.growth),
                                   kernel_init=lecun, use_bias=False,
                                   name=f"{ln}_2_conv")()
                if use_pallas and x.shape[0] == 1:
                    # pre-activation + 3x3 in one strip-DMA Pallas kernel;
                    # exact (same bf16 elementwise + f32-accumulated conv)
                    from ..ops.pallas.conv_fused import fused_conv3x3

                    pend.append(fused_conv3x3(acc, k2, relu=False,
                                              pre_mul=mul1, pre_add=add1))
                else:
                    h = nn.relu(acc * mul1.astype(dt) + add1.astype(dt))
                    pend.append(conv_p(h, k2))
                if sum(t.shape[-1] for t in pend) >= 128:
                    chunks.append(jnp.concatenate(pend, axis=-1))
                    pend = []
            return jnp.concatenate(chunks + pend, axis=-1)

        def transition(x, name):
            y = bn(epsilon=BN_EPS_DENSE, name=f"{name}_bn")(x)
            y = nn.relu(y)
            y = conv(int(x.shape[-1] * 0.5), (1, 1), use_bias=False,
                     name=f"{name}_conv")(y)
            return nn.avg_pool(y, (2, 2), strides=(2, 2), padding="VALID")

        dec_idx = {"conv": 0, "bn": 0}

        def conv_block(x, features):
            # Keras auto-named decoder block: Conv(3x3, same, he_normal, bias)
            # + BN(eps 1e-3) + relu (reference densenet.py:37-48)
            ci, bi = dec_idx["conv"], dec_idx["bn"]
            cname = "conv2d" if ci == 0 else f"conv2d_{ci}"
            bname = "batch_normalization" if bi == 0 else f"batch_normalization_{bi}"
            dec_idx["conv"] += 1
            dec_idx["bn"] += 1
            from ..ops.wpack import pick_packing, wpack_conv

            if (self.fused_decoder and not train and x.shape[0] == 1
                    and x.shape[-1] <= 128 and features <= 128):
                # Pallas fused conv+bias+BN-affine+relu (exact, inference
                # only — BN folds to an affine; ops/pallas/conv_fused.py)
                from ..ops.pallas.conv_fused import fused_conv3x3
                from .s2d_decoder import BNParams, ConvParams

                k, cb = ConvParams((3, 3, x.shape[-1], features),
                                   kernel_init=he, name=cname)()
                mul, add = BNParams(features, epsilon=BN_EPS_DECODER,
                                    name=bname)()
                return fused_conv3x3(x.astype(self.dtype), k, cb, mul, add)

            p = pick_packing(x.shape[2], x.shape[-1], features,
                             enabled=self.wpack)
            if p:
                # exact width-packed execution of the same conv: identical
                # params ('kernel'/'bias' via the byte-compatible container)
                from .s2d_decoder import ConvParams

                k, cb = ConvParams((3, 3, x.shape[-1], features),
                                   kernel_init=he, name=cname)()
                y = wpack_conv(x.astype(self.dtype), k, p,
                               dtype=self.dtype) + cb.astype(self.dtype)
            else:
                y = conv(features, (3, 3), padding="SAME", kernel_init=he,
                         name=cname)(x)
            y = bn(epsilon=BN_EPS_DECODER, name=bname)(y)
            return nn.relu(y)

        x = x.astype(self.dtype)
        if self.chunked_encoder and not train and not self.quantized:
            dense_block = dense_block_chunked  # noqa: F811 — exact swap
        s2ds = int(self.s2d_stem) if not train else 0
        if s2ds:
            assert x.shape[-1] == 3 * 4 ** s2ds, \
                f"s2d_stem={s2ds} expects a packed (N, H/{2**s2ds}, " \
                f"W/{2**s2ds}, {3 * 4**s2ds}) input"

        # --- encoder (DenseNet-121) ---
        if s2ds == 2:
            # level-2 packed stem: the 7x7/2 conv runs 48ch -> 256ch
            # (level-1-packed 64) on the quarter-res grid, BN+relu apply
            # phase-tiled, and the maxpool consumes the remaining packing
            # (exact; zero-pad == -inf pad after relu).  Only the conv1
            # skip pays an unpack.
            import jax.lax as lax

            from ..ops.s2d_input import (bn_packed, conv_kernel_packed,
                                         maxpool3s2_consume, unpack)
            from .s2d_decoder import BNParams, ConvParams

            k, _ = ConvParams((7, 7, 3, 64),
                              kernel_init=nn.initializers.lecun_normal(),
                              use_bias=False, name="conv1__conv")()
            k2, pads, _ = conv_kernel_packed(k, 2, 3, 2)
            y = lax.conv_general_dilated(
                x, k2.astype(self.dtype), (1, 1), pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
            mul, add = BNParams(64, epsilon=BN_EPS_DENSE,
                                name="conv1__bn")()
            y = nn.relu(y * bn_packed(mul, 1).astype(y.dtype)
                        + bn_packed(add, 1).astype(y.dtype))
            conv1 = unpack(y)
            y = maxpool3s2_consume(y, 1, 0.0)
        else:
            if s2ds:
                # packed-input stem: same 'conv1__conv' parameters,
                # re-indexed for the s2d grid (pad 3 + 7x7/2 VALID ->
                # 4x4/1 over 12ch)
                import jax.lax as lax

                from ..ops.s2d_input import stem_kernel_s2d
                from .s2d_decoder import ConvParams

                k, _ = ConvParams((7, 7, 3, 64),
                                  kernel_init=nn.initializers.lecun_normal(),
                                  use_bias=False, name="conv1__conv")()
                k2, pads = stem_kernel_s2d(k, 3)
                y = lax.conv_general_dilated(
                    x, k2.astype(self.dtype), (1, 1), pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype)
            else:
                y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
                y = conv(64, (7, 7), strides=(2, 2), padding="VALID",
                         use_bias=False, name="conv1__conv")(y)
            y = bn(epsilon=BN_EPS_DENSE, name="conv1__bn")(y)
            y = nn.relu(y)
            conv1 = y
            y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="VALID")
        npb = int(self.pallas_blocks) if not train else 0
        y = dense_block(y, self.blocks[0], "conv2", use_pallas=npb >= 1)
        conv2 = y
        y = transition(y, "pool2")
        y = dense_block(y, self.blocks[1], "conv3", use_pallas=npb >= 2)
        conv3 = y
        y = transition(y, "pool3")
        y = dense_block(y, self.blocks[2], "conv4", use_pallas=npb >= 3)
        conv4 = y
        y = transition(y, "pool4")
        y = dense_block(y, self.blocks[3], "conv5", use_pallas=npb >= 4)
        y = bn(epsilon=BN_EPS_DENSE, name="bn")(y)
        conv5 = y  # note: no relu after 'bn', faithful to the reference

        # --- decoder (U-Net) ---
        stages = [(320, conv4), (256, conv3), (128, conv2), (96, conv1),
                  (64, None)]
        trunc = int(self.trunc_last) if not train else 0
        if trunc:
            dropped = stages[-trunc:]
            stages = stages[:-trunc]
        n_s2d = min(self.s2d_stages, len(stages)) if self.s2d_decoder else 0
        n_fs = 0
        if self.fused_stages and not train and n_s2d == 0 and x.shape[0] == 1:
            n_fs = min(self.fused_stages, len(stages))

        def fused_stage(y, feats, skip):
            # one whole decoder stage in a single Pallas kernel (exact; see
            # ops/pallas/stage_fused.py); params via the byte-compatible
            # containers so checkpoints/tree are untouched
            from ..ops.pallas.stage_fused import fused_up_stage
            from .s2d_decoder import BNParams, ConvParams

            ci, bi = dec_idx["conv"], dec_idx["bn"]
            names = [("conv2d" if i == 0 else f"conv2d_{i}",
                      "batch_normalization" if j == 0
                      else f"batch_normalization_{j}")
                     for i, j in ((ci, bi), (ci + 1, bi + 1))]
            dec_idx["conv"] += 2
            dec_idx["bn"] += 2
            ka, ba = ConvParams((3, 3, y.shape[-1], feats), kernel_init=he,
                                name=names[0][0])()
            ma, aa = BNParams(feats, epsilon=BN_EPS_DECODER,
                              name=names[0][1])()
            cs = 0 if skip is None else skip.shape[-1]
            kb, bb = ConvParams((3, 3, feats + cs, feats), kernel_init=he,
                                name=names[1][0])()
            mb, ab = BNParams(feats, epsilon=BN_EPS_DECODER,
                              name=names[1][1])()
            return fused_up_stage(
                y.astype(self.dtype), ka, ba, ma, aa, kb, bb, mb, ab,
                None if skip is None else skip.astype(self.dtype))

        hc = int(self.halo_crop)
        if (train or trunc or n_s2d or n_fs or self.wpack
                or self.fused_decoder or hc % 32 or hc < 64):
            hc = 0
        h_full = x.shape[1] * 2 ** s2ds
        fresh = h_full - 2 * hc

        def crop_to(y, margin, scale):
            # center-crop toward (fresh/scale + 2*margin); margins >= the
            # remaining ops' receptive field keep the output exact.  Crops
            # are floored to multiples of 8 so every dim stays 16-aligned
            # (odd-dim slices measured -2.8% in-model: they break XLA's
            # (16,128) tiling and the upsample->conv input fusion); the
            # final margin=0 crop is exact by construction.
            cur = (y.shape[1] - fresh // scale) // 2
            c = cur if margin == 0 else (cur - margin) // 8 * 8
            return y[:, c:-c, c:-c, :] if c > 0 else y

        y = conv5
        scale = 32
        for i, (feats, skip) in enumerate(
                stages[:len(stages) - n_s2d - n_fs]):
            if hc:
                y = crop_to(y, 2, scale)
            scale //= 2
            y = conv_block(upsample2x(y), feats)
            if skip is not None:
                if hc:
                    skip = crop_to(skip, (y.shape[1] - fresh // scale) // 2,
                                   scale)
                y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
            y = conv_block(y, feats)
        if hc:
            y = crop_to(y, 0, 1)
        for feats, skip in stages[len(stages) - n_fs:]:
            y = fused_stage(y, feats, skip)

        if n_s2d:
            from .s2d_decoder import ConvParams, s2d_unet_decoder

            def make_conv(cin, cout):
                ci = dec_idx["conv"]
                cname = "conv2d" if ci == 0 else f"conv2d_{ci}"
                dec_idx["conv"] += 1
                return ConvParams((3, 3, cin, cout), kernel_init=he,
                                  name=cname)()

            def make_bn(feats):
                bi = dec_idx["bn"]
                bname = ("batch_normalization" if bi == 0
                         else f"batch_normalization_{bi}")
                dec_idx["bn"] += 1
                from .s2d_decoder import BNParams
                return BNParams(feats, epsilon=BN_EPS_DECODER, name=bname)()

            def make_head(cin):
                ci = dec_idx["conv"]
                return ConvParams(
                    (1, 1, cin, self.num_classes),
                    kernel_init=nn.initializers.lecun_normal(),
                    name=f"conv2d_{ci}")()

            tail = stages[len(stages) - n_s2d:]
            r = s2d_unet_decoder(
                y, [s for _, s in tail if s is not None],
                tuple(f for f, _ in tail), make_conv, make_bn, make_head,
                self.num_classes, self.dtype)
            return r[..., 1] if binary and self.num_classes == 2 else r

        if trunc:
            # stand-in for each dropped stage: tensor of the same shape and
            # consumer structure, none of the stage's conv FLOPs
            for feats, _ in dropped:
                y = upsample2x(y)[..., :feats]
        if binary and self.num_classes == 2 and not train:
            from .heads import binary_p1

            return binary_p1(y, f"conv2d_{dec_idx['conv']}")
        logits = conv(self.num_classes, (1, 1), name=f"conv2d_{dec_idx['conv']}")(y)
        return nn.softmax(logits.astype(jnp.float32), axis=-1)
