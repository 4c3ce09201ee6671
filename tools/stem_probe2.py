#!/usr/bin/env python
"""Split the s2d-stem loss (stem_probe.py: 75.6 ms vs 39.6 canonical):
time the s2d TRANSFORM and the 4x4x12 conv separately, plus transform
variants (reshape-transpose vs strided-slice concat) and a u8-input form
(what a host-side s2d would feed).

Usage: python tools/stem_probe2.py [side] [iters]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


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


def s2d_reshape(xp):
    n, sp, _, c = xp.shape
    x2 = xp.reshape(n, sp // 2, 2, sp // 2, 2, c)
    return x2.transpose(0, 1, 3, 2, 4, 5).reshape(n, sp // 2, sp // 2, 4 * c)


def s2d_slices(xp):
    return jnp.concatenate(
        [xp[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)], axis=-1)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 4352
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    key = jax.random.PRNGKey(0)
    sp = side + 6
    xp = jax.random.normal(key, (1, sp, sp, 3), jnp.bfloat16)
    x2 = jax.jit(s2d_reshape)(xp)
    w2 = jax.random.normal(key, (4, 4, 12, 64), jnp.bfloat16) * 0.05

    time_fn(s2d_reshape, (xp,), iters, "s2d_reshape_transpose")
    time_fn(s2d_slices, (xp,), iters, "s2d_strided_slices")

    def conv_only(x2, w2):
        return jax.lax.conv_general_dilated(
            x2, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    time_fn(conv_only, (x2, w2), iters, "conv4x4x12_only")

    # 16x s2d (4x4 blocks): 48-ch input, 2x2 kernel, stride 1 on quarter res
    # exactness aside (alignment differs), just measure the conv shape
    x4 = jax.random.normal(key, (1, sp // 4 + 1, sp // 4 + 1, 48),
                           jnp.bfloat16)
    w4 = jax.random.normal(key, (2, 2, 48, 64), jnp.bfloat16) * 0.05

    def conv2x2x48(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    time_fn(conv2x2x48, (x4, w4), iters, "conv2x2x48_quarter_res")


if __name__ == "__main__":
    main()
