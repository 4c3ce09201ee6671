#!/usr/bin/env python
"""Decide the host-side s2d stem lever (BASELINE.md round-3): with the
loader shipping a 2x2-space-to-depth-packed supertile, each TTA variant
becomes a spatial transform + PHASE-CHANNEL PERMUTATION of the packed
tensor.  The canonical path's full-res TTA costs ~3 ms in-model because XLA
fuses the flip/rot into the stem conv's input read — this probe measures
whether the packed-domain equivalent fuses too (if yes, the stem lever is
conv 39.6 -> 18.6 ms per forward for dense/inception and ~x for deeplab;
if the permutation materializes a relayout it's dead like on-device s2d).

Also validates exactness: conv4x4(packed_tta(x2)) == stem(tta(x)) center.

Usage: python tools/stem_probe4.py [side] [iters]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


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


# phase-channel permutations for (py, px, c) channel order, c minor (12ch)
def _perm(py_swap, px_swap, transpose):
    idx = []
    for py in (0, 1):
        for px in (0, 1):
            spy = 1 - py if py_swap else py
            spx = 1 - px if px_swap else px
            if transpose:
                spy, spx = spx, spy
            for c in range(3):
                idx.append((spy * 2 + spx) * 3 + c)
    return jnp.asarray(idx)


def flip_lr_packed(x2):
    return x2[:, :, ::-1, :][..., _perm(False, True, False)]


def rot180_packed(x2):
    return x2[:, ::-1, ::-1, :][..., _perm(True, True, False)]


def rot90_packed(x2):
    # rot90 (CCW, like jnp.rot90 axes (1,2)): transpose + reverse rows
    y = jnp.swapaxes(x2, 1, 2)[:, ::-1, :, :]
    return y[..., _perm(True, False, True)]


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 4352
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    key = jax.random.PRNGKey(0)
    half = side // 2
    x2 = jax.random.normal(key, (1, half + 2, half + 2, 12), jnp.bfloat16)
    w2 = jax.random.normal(key, (4, 4, 12, 64), jnp.bfloat16) * 0.05

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    time_fn(conv, (x2, w2), iters, "conv4x4x12_plain")
    time_fn(lambda x, w: conv(flip_lr_packed(x), w), (x2, w2), iters,
            "conv4x4x12_flip_lr_perm")
    time_fn(lambda x, w: conv(rot180_packed(x), w), (x2, w2), iters,
            "conv4x4x12_rot180_perm")
    time_fn(lambda x, w: conv(rot90_packed(x), w), (x2, w2), iters,
            "conv4x4x12_rot90_perm")

    # u8 input + fused normalize (what the loader would actually ship)
    xu8 = (jax.random.uniform(key, (1, half + 2, half + 2, 12)) * 255
           ).astype(jnp.uint8)
    mean = jnp.tile(jnp.asarray([0.485, 0.456, 0.406]), 4) * 255
    inv = 1.0 / (jnp.tile(jnp.asarray([0.229, 0.224, 0.225]), 4) * 255)

    def norm_conv(xu, w):
        x = ((xu.astype(jnp.float32) - mean) * inv).astype(jnp.bfloat16)
        return conv(x, w)

    time_fn(norm_conv, (xu8, w2), iters, "conv4x4x12_u8_norm")
    time_fn(lambda x, w: conv(flip_lr_packed(
        ((x.astype(jnp.float32) - mean) * inv).astype(jnp.bfloat16)), w),
        (xu8, w2), iters, "conv4x4x12_u8_norm_flip")


if __name__ == "__main__":
    main()
