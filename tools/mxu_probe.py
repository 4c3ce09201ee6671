#!/usr/bin/env python
"""Microbenchmark MXU conv throughput on the attached TPU: bf16 vs int8.

The axon relay adds ~7 ms per jitted dispatch, so each measurement chains
REPS convs inside ONE jitted scan (output feeds input) and times the whole
program — the per-conv time is then pure device time.

Usage: python tools/mxu_probe.py
"""
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

REPS = 40


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    return (time.time() - t0) / iters / REPS


def conv(x, k, acc):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc)


def chain_bf16(x, k):
    def body(x, _):
        y = conv(x, k, jnp.float32)
        # cheap renorm keeps values finite; cast back to bf16 input
        return (y * 1e-3).astype(jnp.bfloat16), 0.
    y, _ = lax.scan(body, x, None, length=REPS)
    return y


def chain_int8(x, k):
    def body(x, _):
        y = conv(x, k, jnp.int32)
        return jnp.clip(y >> 6, -127, 127).astype(jnp.int8), 0
    y, _ = lax.scan(body, x, None, length=REPS)
    return y


def chain_dw(x, k, c):
    def body(x, _):
        y = lax.conv_general_dilated(
            x, k, (1, 1), "SAME", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y * 1e-3).astype(jnp.bfloat16), 0.
    y, _ = lax.scan(body, x, None, length=REPS)
    return y


def main():
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    shapes = [
        (1, 1024, 1024, 32),
        (1, 1024, 1024, 64),
        (1, 1024, 1024, 96),
        (1, 512, 512, 128),
        (1, 512, 512, 256),
        (1, 256, 256, 512),
        (1, 144, 144, 728),
    ]
    for (n, h, w, c) in shapes:
        flops = 2 * n * h * w * c * c * 9
        for dt, fn, peak in [(jnp.bfloat16, chain_bf16, 197e12),
                             (jnp.int8, chain_int8, 394e12)]:
            x = jnp.asarray(rng.integers(-8, 8, (n, h, w, c)), dt)
            k = jnp.asarray(rng.integers(-8, 8, (3, 3, c, c)), dt)
            try:
                dt_s = timed(jax.jit(fn), x, k)
                print(f"conv3x3 {h}x{w}x{c} {dt.__name__:8s}: "
                      f"{dt_s*1e3:7.3f} ms  {flops/dt_s/1e12:6.1f} T/s "
                      f"({flops/dt_s/peak*100:4.1f}% of peak)", flush=True)
            except Exception as e:
                print(f"conv3x3 {h}x{w}x{c} {dt.__name__:8s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)

    for (h, w, c) in [(512, 512, 256), (144, 144, 728)]:
        x = jnp.asarray(rng.integers(-8, 8, (1, h, w, c)), jnp.bfloat16)
        k = jnp.asarray(rng.integers(-8, 8, (3, 3, 1, c)), jnp.bfloat16)
        dt_s = timed(jax.jit(lambda x, k, c=c: chain_dw(x, k, c)), x, k)
        flops = 2 * h * w * c * 9
        bw = 2 * h * w * c * 2  # read+write bf16
        print(f"depthwise3x3 {h}x{w}x{c} bf16: {dt_s*1e3:7.3f} ms  "
              f"{flops/dt_s/1e12:6.2f} T/s  {bw/dt_s/1e9:6.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
