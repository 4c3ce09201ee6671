"""Inception-ResNet-v2 U-Net in flax, bfloat16 compute.

Architecture parity target: ``get_inception_resnet_v2_unet_softmax``
(``reference DigiPathAI/models/inception.py:169-271``): IRv2 encoder (stem,
mixed_5b, 10x block35 @0.17, mixed_6a, 20x block17 @0.1, mixed_7a,
9x block8 @0.2 + 1x block8 @1.0 no-act, conv_7b 1536) with the same 5-stage
U-Net decoder as the DenseNet variant and a 2-class softmax head.

Encoder conv+BN pairs use ``scale=False`` batch norm (no gamma), Keras eps
1e-3; residual-block output projections have bias and *no* BN
(``reference inception.py:49-86,153-158``).  Unnamed Keras layers are mirrored
via ``KerasNamer`` so checkpoints convert by name.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .densenet_unet import upsample2x
from .keras_names import KerasNamer

BN_EPS = 1e-3


class InceptionResNetV2UNet(nn.Module):
    num_classes: int = 2
    dtype: Any = jnp.bfloat16
    # Exact space-to-depth form for the LAST s2d_stages decoder stages
    # (same params/outputs, faster on TPU where channels are narrow)
    s2d_decoder: bool = False
    s2d_stages: int = 2
    # int8 inference for the wide convs (opt-in, see models/quant.py)
    quantized: bool = False
    # exact width-packed decoder convs (opt-in, see ops/wpack.py)
    wpack: bool = False
    # Pack parallel 1x1 branch heads (which share one input) into a single
    # conv: kernels concatenated along C_out, folded BN affines applied to
    # the packed output, then split.  Bit-compatible parameter tree (same
    # Keras names via ConvParams/BNParams declared in namer order) and the
    # same per-channel dots, so checkpoints and outputs are unchanged; the
    # win is MXU lane utilization — three 1x1->32 heads run at 32/128 lanes
    # each, the packed 1x1->96 at 96/128 (block35; similarly block17/8,
    # mixed_5b/7a).  Inference only; canonical path under train/quantized.
    # Measured +2.2% in-model (486.7 vs 476.3 eq-pps, tile 4096, v5e) —
    # the inference default.
    packed_heads: bool = True
    # Pallas fused decoder convs (opt-in, inference only; conv_fused.py)
    fused_decoder: bool = False
    # Pallas WHOLE-STAGE fusion (upsample+convA+convB per kernel) for the
    # LAST fused_stages decoder stages (inference, N=1; stage_fused.py)
    fused_stages: int = 0
    # MEASUREMENT ONLY: drop the last N decoder stages' convs (replaced by
    # upsample + channel slice) to attribute in-model per-stage cost.
    trunc_last: int = 0
    # Tile-mode halo (px at full res, multiple of 32, >= 64): crop decoder
    # feature maps progressively so the discarded halo fringe is never
    # computed above the bottleneck — receptive-field-exact, see
    # densenet_unet.DenseNet121UNet.halo_crop.  Inference only; 0 disables.
    halo_crop: int = 0
    # Input arrives space-to-depth packed (level 1: (N, H/2, W/2, 12);
    # level 2: (N, H/4, W/4, 48)) and the stem runs on the packed grid
    # with re-indexed kernels — exact, same params (ops/s2d_input.py; see
    # densenet_unet.s2d_stem).  At level 2 ALL THREE narrow stem convs
    # (3->32/2, 32->32, 32->64 at 4352^2/2176^2 for tile 4096 — the
    # encoder fat per the round-3 trunc attribution) run as dense
    # phase-packed convs (48->128, 128->128, 128->256 at 1088^2) with
    # full MXU lane occupancy; the 3x3/2 maxpool consumes the packing.
    s2d_stem: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 binary: bool = False) -> jnp.ndarray:
        """``binary=True``: rank-3 p(class 1) head — see models/heads.py."""
        from .quant import conv_ctor

        conv = partial(conv_ctor(False if train else self.quantized),
                       dtype=self.dtype, param_dtype=jnp.float32)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.99, epsilon=BN_EPS, dtype=self.dtype,
                     param_dtype=jnp.float32)
        he = nn.initializers.he_normal()
        namer = KerasNamer()

        def conv2d_bn(x, filters, kernel, strides=1, activation="relu",
                      use_bias=False, name=None):
            if isinstance(kernel, int):
                kernel = (kernel, kernel)
            cname = name if name is not None else namer.conv()
            y = conv(filters, kernel, strides=(strides, strides),
                     padding="SAME", use_bias=use_bias, name=cname)(x)
            if not use_bias:
                bname = (name + "_bn") if name is not None else namer.bn()
                y = bn(use_scale=False, name=bname)(y)
            if activation is not None:
                y = nn.relu(y)
            return y

        use_pack = (self.packed_heads and not train and not self.quantized
                    and not self.wpack)

        def cb(cin, filters, kernel=1):
            """Declare one encoder conv+BN param set — byte-compatible with
            the ``conv2d_bn`` tree (ConvParams/BNParams at the same namer
            positions) — and return (kernel, folded BN mul, add)."""
            from .s2d_decoder import BNParams, ConvParams

            if isinstance(kernel, int):
                kernel = (kernel, kernel)
            k, _ = ConvParams(kernel + (cin, filters),
                              kernel_init=nn.initializers.lecun_normal(),
                              use_bias=False, name=namer.conv())()
            m, a = BNParams(filters, epsilon=BN_EPS, use_scale=False,
                            name=namer.bn())()
            return k, m, a

        def _enc_conv(x, k, strides=(1, 1)):
            import jax.lax as lax

            return lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), strides, "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)

        def cb_apply(x, p, strides=1):
            k, m, a = p
            y = _enc_conv(x, k, (strides, strides))
            return nn.relu(y * m.astype(y.dtype) + a.astype(y.dtype))

        def cb_packed(x, ps):
            """k parallel 1x1 heads sharing input ``x`` as ONE conv: kernels
            concatenated along C_out (each output channel keeps its own dot,
            so per-channel results match the unpacked convs), folded BN
            affine + relu on the packed tensor, split back per head."""
            k = jnp.concatenate([p[0] for p in ps], axis=-1)
            m = jnp.concatenate([p[1] for p in ps])
            a = jnp.concatenate([p[2] for p in ps])
            y = nn.relu(_enc_conv(x, k) * m.astype(self.dtype)
                        + a.astype(self.dtype))
            outs, off = [], 0
            for p in ps:
                f = p[0].shape[-1]
                outs.append(y[..., off:off + f])
                off += f
            return outs

        def block35(x, scale, idx):
            if use_pack:
                c = x.shape[-1]
                p0, p1h, p1b = cb(c, 32), cb(c, 32), cb(32, 32, 3)
                p2h, p2b, p2c = cb(c, 32), cb(32, 48, 3), cb(48, 64, 3)
                b0, b1, b2 = cb_packed(x, [p0, p1h, p2h])
                b1 = cb_apply(b1, p1b)
                b2 = cb_apply(cb_apply(b2, p2b), p2c)
            else:
                b0 = conv2d_bn(x, 32, 1)
                b1 = conv2d_bn(x, 32, 1)
                b1 = conv2d_bn(b1, 32, 3)
                b2 = conv2d_bn(x, 32, 1)
                b2 = conv2d_bn(b2, 48, 3)
                b2 = conv2d_bn(b2, 64, 3)
            return _residual(x, [b0, b1, b2], scale, f"block35_{idx}")

        def block17(x, scale, idx):
            if use_pack:
                c = x.shape[-1]
                p0, p1h = cb(c, 192), cb(c, 128)
                p1m, p1e = cb(128, 160, (1, 7)), cb(160, 192, (7, 1))
                b0, b1 = cb_packed(x, [p0, p1h])
                b1 = cb_apply(cb_apply(b1, p1m), p1e)
            else:
                b0 = conv2d_bn(x, 192, 1)
                b1 = conv2d_bn(x, 128, 1)
                b1 = conv2d_bn(b1, 160, (1, 7))
                b1 = conv2d_bn(b1, 192, (7, 1))
            return _residual(x, [b0, b1], scale, f"block17_{idx}")

        def block8(x, scale, idx, activation="relu"):
            if use_pack:
                c = x.shape[-1]
                p0, p1h = cb(c, 192), cb(c, 192)
                p1m, p1e = cb(192, 224, (1, 3)), cb(224, 256, (3, 1))
                b0, b1 = cb_packed(x, [p0, p1h])
                b1 = cb_apply(cb_apply(b1, p1m), p1e)
            else:
                b0 = conv2d_bn(x, 192, 1)
                b1 = conv2d_bn(x, 192, 1)
                b1 = conv2d_bn(b1, 224, (1, 3))
                b1 = conv2d_bn(b1, 256, (3, 1))
            return _residual(x, [b0, b1], scale, f"block8_{idx}", activation)

        def _residual(x, branches, scale, name, activation="relu"):
            mixed = jnp.concatenate(branches, axis=-1)
            up = conv2d_bn(mixed, x.shape[-1], 1, activation=None,
                           use_bias=True, name=name + "_conv")
            y = x + up * scale
            return nn.relu(y) if activation is not None else y

        def conv_block(x, features):
            # decoder block (reference inception.py:36-47): conv 3x3 same
            # (bias, he_normal) + full BN + relu; unnamed in Keras
            from ..ops.wpack import pick_packing, wpack_conv

            cname = namer.conv()
            if (self.fused_decoder and not train and x.shape[0] == 1
                    and x.shape[-1] <= 128 and features <= 128):
                # Pallas fused conv+bias+BN-affine+relu (exact, inference
                # only; ops/pallas/conv_fused.py)
                from ..ops.pallas.conv_fused import fused_conv3x3
                from .s2d_decoder import BNParams, ConvParams

                k, cb = ConvParams((3, 3, x.shape[-1], features),
                                   kernel_init=he, name=cname)()
                mul, add = BNParams(features, epsilon=BN_EPS,
                                    name=namer.bn())()
                return fused_conv3x3(x.astype(self.dtype), k, cb, mul, add)

            p = pick_packing(x.shape[2], x.shape[-1], features,
                             enabled=self.wpack)
            if p:
                # exact width-packed execution of the same conv (see
                # ops/wpack.py); params via the byte-compatible container
                from .s2d_decoder import ConvParams

                k, cb = ConvParams((3, 3, x.shape[-1], features),
                                   kernel_init=he, name=cname)()
                y = wpack_conv(x.astype(self.dtype), k, p,
                               dtype=self.dtype) + cb.astype(self.dtype)
            else:
                y = conv(features, (3, 3), padding="SAME", kernel_init=he,
                         name=cname)(x)
            y = bn(name=namer.bn())(y)
            return nn.relu(y)

        def maxpool_same(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        x = x.astype(self.dtype)
        s2ds = int(self.s2d_stem) if not train else 0
        if s2ds:
            assert x.shape[-1] == 3 * 4 ** s2ds, \
                f"s2d_stem={s2ds} expects a packed (N, H/{2**s2ds}, " \
                f"W/{2**s2ds}, {3 * 4**s2ds}) input"

        # --- stem ---
        if s2ds == 2:
            # level-2 packed stem: stem1 emits a LEVEL-1 PACKED output and
            # stem2/stem3 stay on the packed grid as dense 128/256-lane
            # convs; BN+relu apply phase-tiled and the maxpool consumes the
            # packing (exact — nn.max_pool SAME pads -inf on the even
            # input, pad_before 0).  Only the conv1 skip pays one unpack.
            import jax.lax as lax

            from ..ops.s2d_input import (bn_packed, conv_kernel_packed,
                                         maxpool3s2_consume, unpack)

            def packed_cb(y, cin, cout, stride, level):
                k, m, a = cb(cin, cout, 3)
                k2, pads, _ = conv_kernel_packed(k, stride, 0 if stride == 2
                                                 else 1, level)
                y = lax.conv_general_dilated(
                    y, k2.astype(self.dtype), (1, 1), pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype)
                return nn.relu(y * bn_packed(m, 1).astype(y.dtype)
                               + bn_packed(a, 1).astype(y.dtype))

            y = packed_cb(x, 3, 32, 2, 2)     # (H/4, W/4, 4*32)
            y = packed_cb(y, 32, 32, 1, 1)
            y = packed_cb(y, 32, 64, 1, 1)    # (H/4, W/4, 4*64)
            conv1 = unpack(y)
            y = maxpool3s2_consume(y, 0, float("-inf"))
        else:
            if s2ds:
                # packed-input stem1: same params (cb declares the
                # canonical conv+BN tree), kernel re-indexed for the s2d
                # grid (3x3/2 SAME -> 2x2/1 over 12ch; ops/s2d_input.py)
                import jax.lax as lax

                from ..ops.s2d_input import stem_kernel_s2d

                k, m, a = cb(3, 32, 3)
                k2, pads = stem_kernel_s2d(k, 0)
                y = lax.conv_general_dilated(
                    x, k2.astype(self.dtype), (1, 1), pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype)
                y = nn.relu(y * m.astype(y.dtype) + a.astype(y.dtype))
            else:
                y = conv2d_bn(x, 32, 3, strides=2)
            y = conv2d_bn(y, 32, 3)
            y = conv2d_bn(y, 64, 3)
            conv1 = y
            y = maxpool_same(y)
        y = conv2d_bn(y, 80, 1)
        y = conv2d_bn(y, 192, 3)
        conv2 = y
        y = maxpool_same(y)

        # --- mixed_5b ---
        if use_pack:
            c = y.shape[-1]
            p0, p1h, p1b = cb(c, 96), cb(c, 48), cb(48, 64, 5)
            p2h, p2b, p2c = cb(c, 64), cb(64, 96, 3), cb(96, 96, 3)
            b0, b1, b2 = cb_packed(y, [p0, p1h, p2h])
            b1 = cb_apply(b1, p1b)
            b2 = cb_apply(cb_apply(b2, p2b), p2c)
        else:
            b0 = conv2d_bn(y, 96, 1)
            b1 = conv2d_bn(y, 48, 1)
            b1 = conv2d_bn(b1, 64, 5)
            b2 = conv2d_bn(y, 64, 1)
            b2 = conv2d_bn(b2, 96, 3)
            b2 = conv2d_bn(b2, 96, 3)
        # TF average pooling excludes padded cells from the mean
        bp = nn.avg_pool(y, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)
        bp = conv2d_bn(bp, 64, 1)
        y = jnp.concatenate([b0, b1, b2, bp], axis=-1)  # 320

        for i in range(1, 11):
            y = block35(y, 0.17, i)
        conv3 = y

        # --- mixed_6a ---
        b0 = conv2d_bn(y, 384, 3, strides=2)
        b1 = conv2d_bn(y, 256, 1)
        b1 = conv2d_bn(b1, 256, 3)
        b1 = conv2d_bn(b1, 384, 3, strides=2)
        bp = maxpool_same(y)
        y = jnp.concatenate([b0, b1, bp], axis=-1)  # 1088

        for i in range(1, 21):
            y = block17(y, 0.1, i)
        conv4 = y

        # --- mixed_7a ---
        if use_pack:
            c = y.shape[-1]
            p0h, p0b = cb(c, 256), cb(256, 384, 3)
            p1h, p1b = cb(c, 256), cb(256, 288, 3)
            p2h, p2b, p2c = cb(c, 256), cb(256, 288, 3), cb(288, 320, 3)
            b0, b1, b2 = cb_packed(y, [p0h, p1h, p2h])
            b0 = cb_apply(b0, p0b, strides=2)
            b1 = cb_apply(b1, p1b, strides=2)
            b2 = cb_apply(cb_apply(b2, p2b), p2c, strides=2)
        else:
            b0 = conv2d_bn(y, 256, 1)
            b0 = conv2d_bn(b0, 384, 3, strides=2)
            b1 = conv2d_bn(y, 256, 1)
            b1 = conv2d_bn(b1, 288, 3, strides=2)
            b2 = conv2d_bn(y, 256, 1)
            b2 = conv2d_bn(b2, 288, 3)
            b2 = conv2d_bn(b2, 320, 3, strides=2)
        bp = maxpool_same(y)
        y = jnp.concatenate([b0, b1, b2, bp], axis=-1)  # 2080

        for i in range(1, 10):
            y = block8(y, 0.2, i)
        y = block8(y, 1.0, 10, activation=None)

        y = conv2d_bn(y, 1536, 1, name="conv_7b")
        conv5 = y

        # --- decoder (identical scheme to the DenseNet variant) ---
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

            ka, ba = ConvParams((3, 3, y.shape[-1], feats), kernel_init=he,
                                name=namer.conv())()
            ma, aa = BNParams(feats, epsilon=BN_EPS, name=namer.bn())()
            cs = 0 if skip is None else skip.shape[-1]
            kb, bb = ConvParams((3, 3, feats + cs, feats), kernel_init=he,
                                name=namer.conv())()
            mb, ab = BNParams(feats, epsilon=BN_EPS, name=namer.bn())()
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
                return ConvParams((3, 3, cin, cout), kernel_init=he,
                                  name=namer.conv())()

            def make_bn(feats):
                from .s2d_decoder import BNParams
                return BNParams(feats, epsilon=BN_EPS, name=namer.bn())()

            def make_head(cin):
                return ConvParams(
                    (1, 1, cin, self.num_classes),
                    kernel_init=nn.initializers.lecun_normal(),
                    name=namer.conv())()

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

            return binary_p1(y, namer.conv())
        logits = conv(self.num_classes, (1, 1), name=namer.conv())(y)
        return nn.softmax(logits.astype(jnp.float32), axis=-1)
