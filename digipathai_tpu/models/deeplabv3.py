"""DeepLabv3+ (Xception-65 backbone) in flax, bfloat16 compute.

Architecture parity target: ``Deeplabv3``
(``reference DigiPathAI/models/deeplabv3.py:219-457``) as instantiated by the
engine (``reference DigiPathAI/helpers/utils.py:438-446``): Xception
backbone, OS=16, 2 classes, softmax activation, fixed input size.

Structure: entry flow (conv1_1 s2, conv1_2, three conv-shortcut xception
blocks), 16 sum-shortcut middle-flow blocks, exit flow (conv-shortcut block +
depth-activated block with atrous rates), ASPP (image pooling + 1x1 + three
atrous separable branches @6/12/18, eps 1e-5), concat projection, decoder
(align-corners x4 upsample, 48-ch skip projection, two separable convs),
2-class logits, align-corners resize to input size, softmax.

All Keras layers here are explicitly named, so checkpoint conversion is a
direct name map. Separable convs = grouped (depthwise) nn.Conv + pointwise
nn.Conv with BN between, mirroring ``SepConv_BN``
(``reference deeplabv3.py:52-89``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_align_corners


class DeepLabV3Plus(nn.Module):
    num_classes: int = 2
    output_stride: int = 16
    dtype: Any = jnp.bfloat16
    # ASPP image-pooling context extent, in input pixels. 0 = global mean
    # (the reference's semantics for its fixed 256px patches,
    # ``reference deeplabv3.py:377-384``). For fully-convolutional tile
    # inference, set to the reference patch size (256): the context vector
    # is then pooled over patch-sized windows instead of the whole tile,
    # keeping the ASPP context LOCAL like patch mode does (see
    # engine/tile_infer.py and PARITY.md "tile mode" notes). Window size
    # must divide the input size.
    aspp_pool_window: int = 0
    # int8 inference for the wide convs (opt-in, see models/quant.py)
    quantized: bool = False
    # Input arrives space-to-depth packed (level 1: (N, H/2, W/2, 12);
    # level 2: (N, H/4, W/4, 48)) and the narrow entry convs run on the
    # packed grid with re-indexed kernels — exact, same params
    # (ops/s2d_input.py; see densenet_unet.s2d_stem).  At level 2 BOTH
    # entry convs (3->32/2 and 32->64 at 4352^2/2176^2) run as dense
    # phase-packed convs (48->128, 128->256 at 1088^2); the packing is
    # unpacked before the first (depthwise) Xception block.
    s2d_stem: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 binary: bool = False) -> jnp.ndarray:
        from .quant import conv_ctor

        conv = partial(conv_ctor(False if train else self.quantized),
                       dtype=self.dtype, param_dtype=jnp.float32,
                       use_bias=False)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.99, dtype=self.dtype, param_dtype=jnp.float32)

        if self.output_stride == 8:
            entry_block3_stride, middle_block_rate = 1, 2
            exit_block_rates, atrous_rates = (2, 4), (12, 24, 36)
        else:
            entry_block3_stride, middle_block_rate = 2, 1
            exit_block_rates, atrous_rates = (1, 2), (6, 12, 18)

        def pad_for_stride2(y, kernel, rate=1):
            # explicit symmetric-ish padding before VALID stride-2 convs
            # (reference _conv2d_same / SepConv_BN stride!=1 path)
            eff = kernel + (kernel - 1) * (rate - 1)
            lo = (eff - 1) // 2
            hi = (eff - 1) - lo
            return jnp.pad(y, ((0, 0), (lo, hi), (lo, hi), (0, 0)))

        def sep_conv_bn(y, filters, prefix, stride=1, kernel=3, rate=1,
                        depth_activation=False, epsilon=1e-3):
            if stride != 1:
                y = pad_for_stride2(y, kernel, rate)
                padding = "VALID"
            else:
                padding = "SAME"
            if not depth_activation:
                y = nn.relu(y)
            c = y.shape[-1]
            y = conv(c, (kernel, kernel), strides=(stride, stride),
                     padding=padding, kernel_dilation=(rate, rate),
                     feature_group_count=c, name=f"{prefix}_depthwise")(y)
            y = bn(epsilon=epsilon, name=f"{prefix}_depthwise_BN")(y)
            if depth_activation:
                y = nn.relu(y)
            y = conv(filters, (1, 1), padding="SAME",
                     name=f"{prefix}_pointwise")(y)
            y = bn(epsilon=epsilon, name=f"{prefix}_pointwise_BN")(y)
            if depth_activation:
                y = nn.relu(y)
            return y

        def conv2d_same(y, filters, prefix, stride=1, kernel=3, rate=1):
            if stride == 1:
                return conv(filters, (kernel, kernel), padding="SAME",
                            kernel_dilation=(rate, rate), name=prefix)(y)
            y = pad_for_stride2(y, kernel, rate)
            return conv(filters, (kernel, kernel), strides=(stride, stride),
                        padding="VALID", kernel_dilation=(rate, rate),
                        name=prefix)(y)

        def xception_block(y, depth_list, prefix, skip_type, stride, rate=1,
                           depth_activation=False, return_skip=False):
            residual = y
            skip = None
            for i in range(3):
                residual = sep_conv_bn(
                    residual, depth_list[i],
                    f"{prefix}_separable_conv{i + 1}",
                    stride=stride if i == 2 else 1, rate=rate,
                    depth_activation=depth_activation)
                if i == 1:
                    skip = residual
            if skip_type == "conv":
                shortcut = conv2d_same(y, depth_list[-1], f"{prefix}_shortcut",
                                       kernel=1, stride=stride)
                shortcut = bn(epsilon=1e-3, name=f"{prefix}_shortcut_BN")(shortcut)
                out = residual + shortcut
            elif skip_type == "sum":
                out = residual + y
            else:
                out = residual
            return (out, skip) if return_skip else out

        x = x.astype(self.dtype)
        B, H, W, _ = x.shape
        s2ds = int(self.s2d_stem) if not train else 0
        if s2ds:
            assert x.shape[-1] == 3 * 4 ** s2ds, \
                f"s2d_stem={s2ds} expects a packed (N, H/{2**s2ds}, " \
                f"W/{2**s2ds}, {3 * 4**s2ds}) input"
            # logical (full-res) size for the head
            H, W = H * 2 ** s2ds, W * 2 ** s2ds

        # --- entry flow ---
        if s2ds == 2:
            # level-2 packed entry: conv1_1 emits a LEVEL-1 PACKED output
            # and conv1_2 stays on the packed grid as a dense 128->256-lane
            # conv; BN+relu apply phase-tiled.  Unpacked before the first
            # (depthwise) Xception block.
            import jax.lax as lax

            from ..ops.s2d_input import (bn_packed, conv_kernel_packed,
                                         unpack)
            from .s2d_decoder import BNParams, ConvParams

            def packed_cb(y, cin, cout, name, stride, level):
                k, _ = ConvParams((3, 3, cin, cout),
                                  kernel_init=nn.initializers.lecun_normal(),
                                  use_bias=False, name=name)()
                k2, pads, _ = conv_kernel_packed(
                    k, stride, 0 if stride == 2 else 1, level)
                y = lax.conv_general_dilated(
                    y, k2.astype(self.dtype), (1, 1), pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype)
                m, a = BNParams(cout, epsilon=1e-3, name=name + "_BN")()
                return nn.relu(y * bn_packed(m, 1).astype(y.dtype)
                               + bn_packed(a, 1).astype(y.dtype))

            y = packed_cb(x, 3, 32, "entry_flow_conv1_1", 2, 2)
            y = packed_cb(y, 32, 64, "entry_flow_conv1_2", 1, 1)
            y = unpack(y)
        else:
            if s2ds:
                # packed-input entry conv: same params, kernel re-indexed
                # for the s2d grid (3x3/2 SAME -> 2x2/1 over 12ch;
                # ops/s2d_input.py)
                import jax.lax as lax

                from ..ops.s2d_input import stem_kernel_s2d
                from .s2d_decoder import BNParams, ConvParams

                k, _ = ConvParams((3, 3, 3, 32),
                                  kernel_init=nn.initializers.lecun_normal(),
                                  use_bias=False, name="entry_flow_conv1_1")()
                k2, pads = stem_kernel_s2d(k, 0)
                y = lax.conv_general_dilated(
                    x, k2.astype(self.dtype), (1, 1), pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype)
                m, a = BNParams(32, epsilon=1e-3,
                                name="entry_flow_conv1_1_BN")()
                y = y * m.astype(y.dtype) + a.astype(y.dtype)
            else:
                y = conv(32, (3, 3), strides=(2, 2), padding="SAME",
                         name="entry_flow_conv1_1")(x)
                y = bn(epsilon=1e-3, name="entry_flow_conv1_1_BN")(y)
            y = nn.relu(y)
            y = conv2d_same(y, 64, "entry_flow_conv1_2", kernel=3, stride=1)
            y = bn(epsilon=1e-3, name="entry_flow_conv1_2_BN")(y)
            y = nn.relu(y)

        y = xception_block(y, [128, 128, 128], "entry_flow_block1",
                           "conv", stride=2)
        y, skip1 = xception_block(y, [256, 256, 256], "entry_flow_block2",
                                  "conv", stride=2, return_skip=True)
        y = xception_block(y, [728, 728, 728], "entry_flow_block3",
                           "conv", stride=entry_block3_stride)

        # --- middle flow ---
        for i in range(16):
            y = xception_block(y, [728, 728, 728], f"middle_flow_unit_{i + 1}",
                               "sum", stride=1, rate=middle_block_rate)

        # --- exit flow ---
        y = xception_block(y, [728, 1024, 1024], "exit_flow_block1",
                           "conv", stride=1, rate=exit_block_rates[0])
        y = xception_block(y, [1536, 1536, 2048], "exit_flow_block2",
                           "none", stride=1, rate=exit_block_rates[1],
                           depth_activation=True)

        # --- ASPP ---
        feat_h, feat_w = y.shape[1], y.shape[2]
        if self.aspp_pool_window:
            # patch-equivalent context: mean over window-sized blocks at the
            # feature resolution, broadcast back within each block (the
            # per-patch analog of the reference's global pool + resize)
            fw = self.aspp_pool_window // self.output_stride
            if feat_h % fw or feat_w % fw:
                raise ValueError(
                    f"aspp_pool_window {self.aspp_pool_window} must divide "
                    f"the input size (features {feat_h}x{feat_w}, window {fw})")
            b4 = nn.avg_pool(y, (fw, fw), strides=(fw, fw), padding="VALID")
        else:
            b4 = jnp.mean(y, axis=(1, 2), keepdims=True)
        b4 = conv(256, (1, 1), padding="SAME", name="image_pooling")(b4)
        b4 = bn(epsilon=1e-5, name="image_pooling_BN")(b4)
        b4 = nn.relu(b4)
        if self.aspp_pool_window:
            fw = self.aspp_pool_window // self.output_stride
            b4 = jnp.repeat(jnp.repeat(b4, fw, axis=1), fw, axis=2)
        else:
            b4 = resize_bilinear_align_corners(b4, (feat_h, feat_w))

        b0 = conv(256, (1, 1), padding="SAME", name="aspp0")(y)
        b0 = bn(epsilon=1e-5, name="aspp0_BN")(b0)
        b0 = nn.relu(b0)

        b1 = sep_conv_bn(y, 256, "aspp1", rate=atrous_rates[0],
                         depth_activation=True, epsilon=1e-5)
        b2 = sep_conv_bn(y, 256, "aspp2", rate=atrous_rates[1],
                         depth_activation=True, epsilon=1e-5)
        b3 = sep_conv_bn(y, 256, "aspp3", rate=atrous_rates[2],
                         depth_activation=True, epsilon=1e-5)

        y = jnp.concatenate([b4, b0, b1, b2, b3], axis=-1)
        y = conv(256, (1, 1), padding="SAME", name="concat_projection")(y)
        y = bn(epsilon=1e-5, name="concat_projection_BN")(y)
        y = nn.relu(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)

        # --- decoder ---
        y = resize_bilinear_align_corners(
            y, (feat_h * (self.output_stride // 4),
                feat_w * (self.output_stride // 4)))
        dec_skip = conv(48, (1, 1), padding="SAME",
                        name="feature_projection0")(skip1)
        dec_skip = bn(epsilon=1e-5, name="feature_projection0_BN")(dec_skip)
        dec_skip = nn.relu(dec_skip)
        y = jnp.concatenate([y, dec_skip.astype(y.dtype)], axis=-1)
        y = sep_conv_bn(y, 256, "decoder_conv0", depth_activation=True,
                        epsilon=1e-5)
        y = sep_conv_bn(y, 256, "decoder_conv1", depth_activation=True,
                        epsilon=1e-5)

        # 2-class head: 'custom_logits_semantic' since classes != 21
        # (reference deeplabv3.py:436-441)
        if binary and self.num_classes == 2 and not train:
            # sigmoid(resize(l1 - l0)) == softmax(resize(l))[..., 1] exactly
            # (the bilinear resize is linear); rank-3 all the way, so neither
            # the resize nor the head pays the 128-lane channel padding
            from .s2d_decoder import ConvParams

            k, b = ConvParams((1, 1, y.shape[-1], 2),
                              kernel_init=nn.initializers.lecun_normal(),
                              name="custom_logits_semantic")()
            wd = (k[0, 0, :, 1] - k[0, 0, :, 0]).astype(y.dtype)
            bd = (b[1] - b[0]).astype(jnp.float32)
            z = jnp.einsum("nhwc,c->nhw", y, wd,
                           preferred_element_type=jnp.float32) + bd
            return nn.sigmoid(resize_bilinear_align_corners(z, (H, W)))
        y = nn.Conv(self.num_classes, (1, 1), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="custom_logits_semantic")(y)
        y = resize_bilinear_align_corners(y, (H, W))
        return nn.softmax(y.astype(jnp.float32), axis=-1)
