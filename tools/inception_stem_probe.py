#!/usr/bin/env python
"""Attribute the InceptionResNetV2 encoder's stem cost at tile-4096 shapes.

Round-3 context: trunc attribution puts inception's encoder+head at ~278 ms
of the ~428 ms forward (BASELINE.md).  The stem runs three narrow convs at
huge spatial sizes — 3x3/2 C=3->32 at 4352^2, 3x3 32->32 and 3x3 32->64 at
2176^2 — all with N<=64 output lanes (<=50% MXU lane use) and C<=64
contractions.  This probe times each stem conv plus the mixed-block stacks
so the next optimization targets the real fat.

Usage: python tools/inception_stem_probe.py [side] [iters]
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


def conv(x, k, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 4352
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    key = jax.random.PRNGKey(0)

    shapes = [
        # (tag, in_side, cin, cout, k, stride)
        ("stem1_3x3s2_c3", side, 3, 32, 3, 2),
        ("stem2_3x3_c32", side // 2, 32, 32, 3, 1),
        ("stem3_3x3_c64", side // 2, 32, 64, 3, 1),
        ("stem4_1x1_c80", side // 4, 64, 80, 1, 1),
        ("stem5_3x3_c192", side // 4, 80, 192, 3, 1),
    ]
    import functools

    for tag, s, ci, co, kk, st in shapes:
        x = jax.random.normal(jax.random.fold_in(key, s * ci),
                              (1, s, s, ci), jnp.bfloat16)
        w = jax.random.normal(key, (kk, kk, ci, co), jnp.bfloat16) * 0.05
        time_fn(functools.partial(conv, strides=(st, st)), (x, w), iters, tag)

    # one block35 at 544^2 x 320 and one block17 at 272^2 x 1088
    def block35(x, ws):
        b0 = conv(x, ws[0])
        b1 = conv(conv(x, ws[1]), ws[2])
        b2 = conv(conv(conv(x, ws[3]), ws[4]), ws[5])
        up = conv(jnp.concatenate([b0, b1, b2], -1), ws[6])
        return jax.nn.relu(x + 0.17 * up)

    s5 = side // 8
    x5 = jax.random.normal(key, (1, s5, s5, 320), jnp.bfloat16)
    ws5 = [jax.random.normal(key, shp, jnp.bfloat16) * 0.05 for shp in
           [(1, 1, 320, 32), (1, 1, 320, 32), (3, 3, 32, 32),
            (1, 1, 320, 32), (3, 3, 32, 48), (3, 3, 48, 64),
            (1, 1, 128, 320)]]
    time_fn(block35, (x5, ws5), iters, "block35_x1_544")

    def block17(x, ws):
        b0 = conv(x, ws[0])
        b1 = conv(conv(conv(x, ws[1]), ws[2]), ws[3])
        up = conv(jnp.concatenate([b0, b1], -1), ws[4])
        return jax.nn.relu(x + 0.1 * up)

    s7 = side // 16
    x7 = jax.random.normal(key, (1, s7, s7, 1088), jnp.bfloat16)
    ws7 = [jax.random.normal(key, shp, jnp.bfloat16) * 0.05 for shp in
           [(1, 1, 1088, 192), (1, 1, 1088, 128), (1, 7, 128, 160),
            (7, 1, 160, 192), (1, 1, 384, 1088)]]
    time_fn(block17, (x7, ws7), iters, "block17_x1_272")


if __name__ == "__main__":
    main()
