#!/usr/bin/env python
"""Race the DenseNet stem (pad3 + 7x7/2 conv, 3ch -> 64) against an exact
space-to-depth rewrite (MLPerf-style): s2d(2x2) of the padded input gives a
(S+6)/2-sided 12-ch tensor on which a 4x4 VALID stride-1 conv with a
re-indexed (partially zero) kernel computes the identical sum —
y[i,j,o] = sum_{di,dj,c} xp[2i+di, 2j+dj, c] w[di,dj,c,o]
         = sum_{a,b,p,q,c} x2[i+a, j+b, (p,q,c)] w[2a+p, 2b+q, c, o].

The canonical stem measured 39.7 ms at tile-4096 shapes
(tools/encoder_probe2.py) — XLA's C=3 conv pathology.

Usage: python tools/stem_probe.py [side] [iters]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def s2d_kernel(w):
    """(7,7,3,64) -> (4,4,12,64) with w2[a,b,(p,q,c),o] = w[2a+p,2b+q,c,o]."""
    k7, _, c, o = w.shape
    w2 = jnp.zeros((4, 4, 2, 2, c, o), w.dtype)
    for a in range(4):
        for p in range(2):
            if 2 * a + p >= k7:
                continue
            for b in range(4):
                for q in range(2):
                    if 2 * b + q >= k7:
                        continue
                    w2 = w2.at[a, b, p, q].set(w[2 * a + p, 2 * b + q])
    return w2.reshape(4, 4, 4 * c, o)


def stem_v0(x, w):
    y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    return jax.lax.conv_general_dilated(
        y, w, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def stem_s2d(x, w2):
    n, s, _, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    sp = s + 6
    x2 = xp.reshape(n, sp // 2, 2, sp // 2, 2, c)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(n, sp // 2, sp // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        x2, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


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
                      "compile_s": round(compile_s, 1), "checksum": s,
                      "shape": list(np.shape(out))}), flush=True)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 4352
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, side, side, 3), jnp.bfloat16)
    w = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16) * 0.05
    w2 = s2d_kernel(w)

    # CPU-side exactness check at a small size first
    xs = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 64, 3),
                           jnp.bfloat16)
    a = np.asarray(jnp.float32(stem_v0(xs, w)))
    b = np.asarray(jnp.float32(stem_s2d(xs, w2)))
    print(json.dumps({"tag": "exactness",
                      "max_abs": float(np.abs(a - b).max())}), flush=True)

    time_fn(stem_v0, (x, w), iters, "stem_v0_7x7s2")
    time_fn(stem_s2d, (x, w2), iters, "stem_s2d_4x4")


if __name__ == "__main__":
    main()
