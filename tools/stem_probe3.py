#!/usr/bin/env python
"""XLA-level variants of the pathological C=3 stem conv (39.6 ms measured,
~2% MXU — tools/encoder_probe2.py) and of the narrow 3x3 32->32 conv:

  padC    zero-pad input channels (and kernel) to 8/16/32/64 — exact
  im2col  explicit patch extraction + one big matmul — exact
  f32     same conv in f32 (rules out a bf16-specific lowering path)
  phase4  stride-2 conv as 4 half-res stride-1 convs summed (output
          phases) — exact for the 7x7/2 stem

Usage: python tools/stem_probe3.py [side] [iters]
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp


def time_fn(fn, args, iters, tag):
    f = jax.jit(fn)
    t0 = time.time()
    try:
        out = f(*args)
        s = float(jax.device_get(jnp.float32(jnp.mean(out))))
    except Exception as e:  # noqa: BLE001 — probe robustness
        print(json.dumps({"tag": tag, "error": str(e)[:200]}), flush=True)
        return
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    s = float(jax.device_get(jnp.float32(jnp.mean(out))))
    dt = (time.time() - t0) / iters
    print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 2),
                      "compile_s": round(compile_s, 1), "checksum": s}),
          flush=True)


def conv(x, k, strides=(1, 1), padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 4352
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, side, side, 3), jnp.bfloat16)
    w = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16) * 0.05

    def stem_pad(x, w, cpad):
        xz = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, cpad - 3)))
        wz = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - 3), (0, 0)))
        return conv(xz, wz, (2, 2))

    def stem_v0(x, w):
        return conv(jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))), w, (2, 2))

    time_fn(stem_v0, (x, w), iters, "stem_v0")
    for cpad in (8, 16, 32, 64):
        time_fn(functools.partial(stem_pad, cpad=cpad), (x, w), iters,
                f"stem_padC{cpad}")

    def stem_f32(x, w):
        return conv(jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))).astype(
            jnp.float32), w.astype(jnp.float32), (2, 2)).astype(jnp.bfloat16)

    time_fn(stem_f32, (x, w), iters, "stem_f32")

    def stem_im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        pat = jax.lax.conv_general_dilated_patches(
            xp, (7, 7), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (1, oh, ow, 147)
        wm = w.transpose(2, 0, 1, 3).reshape(147, 64)  # patches are C-major
        return jnp.einsum("nhwk,ko->nhwo", pat, wm.astype(x.dtype),
                          preferred_element_type=jnp.float32).astype(x.dtype)

    time_fn(stem_im2col, (x, w), iters, "stem_im2col")

    def stem_phase4(x, w):
        # y[2 phases of stride-2 grid]: VALID conv equivalent via 4 shifted
        # half-res convs; measurement-only (alignment simplified)
        xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        acc = None
        for p in (0, 1):
            for q in (0, 1):
                xs = xp[:, p::2, q::2, :]
                ws = w[p::2, q::2]  # (4,4,3,64) / (3,4..) pieces
                r = conv(xs[:, : side // 2 + 3, : side // 2 + 3], ws)
                r = r[:, : side // 2, : side // 2]
                acc = r if acc is None else acc + r
        return acc

    time_fn(stem_phase4, (x, w), iters, "stem_phase4")

    # narrow 3x3 32->32 at half res (inception stem2 shape)
    h = side // 2
    x2 = jax.random.normal(key, (1, h, h, 32), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, 32, 32), jnp.bfloat16) * 0.05
    time_fn(functools.partial(conv, padding="SAME"), (x2, w2), iters,
            "c32_3x3_v0")

    def c32_pad(x, w, cpad):
        wz = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cpad - 32)))
        return conv(x, wz, padding="SAME")[..., :32]

    for cpad in (64, 128):
        time_fn(functools.partial(c32_pad, cpad=cpad), (x2, w2), iters,
                f"c32_3x3_padN{cpad}")

    def c32_im2col(x, w):
        pat = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wm = w.transpose(2, 0, 1, 3).reshape(288, 32)
        return jnp.einsum("nhwk,ko->nhwo", pat, wm.astype(x.dtype),
                          preferred_element_type=jnp.float32).astype(x.dtype)

    time_fn(c32_im2col, (x2, w2), iters, "c32_3x3_im2col")


if __name__ == "__main__":
    main()
