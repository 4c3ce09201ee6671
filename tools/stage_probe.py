#!/usr/bin/env python
"""Time U-Net decoder stage-5 ops standalone: canonical vs s2d forms.

Isolates why whole-model s2d measurements diverge from conv microbenchmarks.
Shapes are dense-UNet stage 5 at tile 2048 (+2x128 halo): half-res H=1152.
Each measurement chains REPS iterations inside one jit via lax.scan with a
scalar feedback carry (keeps the conv live without reshaping hacks).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    return (time.time() - t0) / iters / REPS


def conv(x, w):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def upsample2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def chain(op):
    """Run op(x) REPS times inside one jit; scalar feedback keeps it live."""
    def fn(x, *ks):
        def body(s, _):
            y = op(x * (1.0 + s * 1e-20), *ks)
            return jnp.mean(y).astype(jnp.float32), 0.
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s
    return jax.jit(fn)


def main():
    from digipathai_tpu.models.s2d_decoder import (
        s2d_conv_kernel, upsample_conv_kernel)

    rng = np.random.default_rng(0)
    H = 1152

    def mk(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.normal(0, 0.1, shape), dt)

    u = mk((1, H, H, 96))
    x64 = mk((1, 2 * H, 2 * H, 64))
    x256 = mk((1, H, H, 256))
    kA = mk((3, 3, 96, 64), jnp.float32)
    kB = mk((3, 3, 64, 64), jnp.float32)
    wA = jnp.asarray(np.asarray(upsample_conv_kernel(kA)))
    wB = jnp.asarray(np.asarray(s2d_conv_kernel(kB)))

    cases = [
        ("convA canon ups+96->64@2304", chain(
            lambda x, k: conv(upsample2x(x), k.astype(jnp.bfloat16))), (u, kA)),
        ("convA s2d   96->256@1152   ", chain(
            lambda x, k: conv(x, upsample_conv_kernel(k).astype(jnp.bfloat16))),
         (u, kA)),
        ("convA s2d   prebuilt kernel", chain(
            lambda x, w: conv(x, w.astype(jnp.bfloat16))), (u, wA)),
        ("convB canon 64->64@2304    ", chain(
            lambda x, k: conv(x, k.astype(jnp.bfloat16))), (x64, kB)),
        ("convB s2d   256->256@1152  ", chain(
            lambda x, k: conv(x, s2d_conv_kernel(k).astype(jnp.bfloat16))),
         (x256, kB)),
        ("convB s2d   prebuilt kernel", chain(
            lambda x, w: conv(x, w.astype(jnp.bfloat16))), (x256, wB)),
    ]
    for name, fn, args in cases:
        try:
            dt = timed(fn, *args)
            print(f"{name}: {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
