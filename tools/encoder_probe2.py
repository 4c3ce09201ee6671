#!/usr/bin/env python
"""Round-3 follow-up to encoder_probe.py: attribute the NON-dense-block
parts of the DenseNet encoder path at tile-4096 shapes (4358^2 input incl.
halo), plus block1 (which probe 1 skipped and which carries ~2.1 TFLOP of
3x3 convs at N=32 lanes).

Pieces, at the dense forward's real shapes:
  tta       one dihedral transform + uint8 normalize of the input tile
  stem      pad + 7x7/2 conv + BN + relu (4358^2 x 3 -> 2176^2 x 64)
  maxpool   pad + 3x3/2 max pool (2176^2 -> 1088^2)
  block1    6 dense layers at 2176^2, c0=64 (canonical vs chunked)
  trans     the three transitions (bn+relu+1x1(half)+avgpool)
  head      1x1 -> 2ch + f32 softmax at 4096^2

Usage: python tools/encoder_probe2.py [iters]
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from encoder_probe import block_v0, block_v2, conv, make_params, _bn_relu


def time_fn(fn, args, iters, tag):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    s = float(jax.device_get(jnp.float32(jnp.mean(out))))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    s = float(jax.device_get(jnp.float32(jnp.mean(out))))
    dt = (time.time() - t0) / iters
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1), "checksum": s}),
          flush=True)
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    key = jax.random.PRNGKey(0)
    side = 4352  # tile 4096 + 2*128 halo

    # --- tta + normalize (uint8 -> bf16, mean/std) ---
    u8 = jax.random.randint(key, (side + 6, side + 6, 3), 0, 255, jnp.uint8)

    def tta_norm(t):
        x = jnp.rot90(t, k=1, axes=(0, 1))
        x = x.astype(jnp.bfloat16) / 255.0
        return (x - 0.5) * 2.0

    time_fn(tta_norm, (u8,), iters, "tta_norm_1of5")

    # --- stem ---
    x0 = jax.random.normal(key, (1, side, side, 3), jnp.bfloat16)
    k7 = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16) * 0.05
    s_b = (jax.random.normal(key, (64,), jnp.bfloat16) * 0.1 + 1,
           jax.random.normal(key, (64,), jnp.bfloat16) * 0.1)

    def stem(x, k):
        y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        y = jax.lax.conv_general_dilated(
            y, k, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return _bn_relu(y, *s_b)

    time_fn(stem, (x0, k7), iters, "stem_7x7s2")

    h = side // 2  # 2176
    x1 = jax.random.normal(key, (1, h, h, 64), jnp.bfloat16)

    def mp(x):
        import flax.linen as nn

        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding="VALID")

    time_fn(mp, (x1,), iters, "maxpool3x3s2")

    # --- block1 at 1088^2 c0=64 (after maxpool of 2176) ---
    q = h // 2  # 1088
    xb = jax.random.normal(key, (1, q, q, 64), jnp.bfloat16)
    params = make_params(jax.random.fold_in(key, 1), 64, 6)
    time_fn(functools.partial(block_v0, params=params), (xb,), iters,
            "block1/v0_concat")
    time_fn(functools.partial(block_v2, params=params), (xb,), iters,
            "block1/v2_chunked")

    # --- transitions (three of them at their real shapes) ---
    for name, s, c in (("trans2", q, 256), ("trans3", q // 2, 512),
                       ("trans4", q // 4, 1024)):
        xt = jax.random.normal(key, (1, s, s, c), jnp.bfloat16)
        kt = jax.random.normal(key, (1, 1, c, c // 2), jnp.bfloat16) * 0.05
        sb = (jax.random.normal(key, (c,), jnp.bfloat16) * 0.1 + 1,
              jax.random.normal(key, (c,), jnp.bfloat16) * 0.1)

        def trans(x, k, sb=sb):
            import flax.linen as nn

            y = _bn_relu(x, *sb)
            y = conv(y, k)
            return nn.avg_pool(y, (2, 2), strides=(2, 2), padding="VALID")

        time_fn(trans, (xt, kt), iters, name)

    # --- head: 1x1 64->2 + f32 softmax at 4096^2 ---
    xh = jax.random.normal(key, (1, 4096, 4096, 64), jnp.bfloat16)
    kh = jax.random.normal(key, (1, 1, 64, 2), jnp.bfloat16) * 0.05

    def head(x, k):
        import flax.linen as nn

        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return nn.softmax(y.astype(jnp.float32), axis=-1)

    time_fn(head, (xh, kh), iters, "head_softmax")


if __name__ == "__main__":
    main()
