#!/usr/bin/env python
"""Measure the fused Pallas conv3x3 vs XLA's conv at decoder-stage shapes.

Times N dependent calls (output feeds input through a cheap projection) so
the device pipeline stays busy; the axon relay's ~7 ms dispatch overhead is
small against the 10-100 ms per-conv times at these sizes.

Usage: python tools/conv_fused_probe.py [H] [C] [F]
"""
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from digipathai_tpu.ops.pallas.conv_fused import fused_conv3x3


def xla_conv(x, k, bias, mul, add):
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum((y + bias) * mul + add, 0.0).astype(x.dtype)


def time_fn(fn, x, args, iters=6):
    y = fn(x, *args)
    _ = float(jax.device_get(jnp.sum(y[:, ::64, ::64].astype(jnp.float32))))
    t0 = time.time()
    for _ in range(iters):
        y = fn(y[..., :x.shape[-1]] if y.shape[-1] >= x.shape[-1] else x,
               *args)
    _ = float(jax.device_get(jnp.sum(y[:, ::64, ::64].astype(jnp.float32))))
    return (time.time() - t0) / iters


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 4352
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    print(f"platform: {jax.devices()[0].platform}  shape {h}x{h} {c}->{f}",
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (1, h, h, c)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.08, (3, 3, c, f)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.05, (f,)), jnp.float32)
    mul = jnp.asarray(rng.uniform(0.8, 1.2, (f,)), jnp.float32)
    add = jnp.asarray(rng.normal(0, 0.05, (f,)), jnp.float32)
    flops = 2 * 9 * h * h * c * f

    jx = jax.jit(xla_conv)
    dt = time_fn(jx, x, (k, bias, mul, add))
    print(f"xla   conv+affine+relu: {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} "
          f"T/s ({flops/dt/197e12*100:5.1f}% peak)", flush=True)

    for br, wc in [(4, 512), (8, 512), (4, 1024), (16, 256)]:
        fn = jax.jit(lambda x, k, b, m, a, br=br, wc=wc: fused_conv3x3(
            x, k, b, m, a, block_rows=br, block_cols=wc))
        try:
            dt = time_fn(fn, x, (k, bias, mul, add))
            print(f"pallas R={br:2d} WC={wc:4d}:    {dt*1e3:8.2f} ms  "
                  f"{flops/dt/1e12:6.1f} T/s ({flops/dt/197e12*100:5.1f}% "
                  f"peak)", flush=True)
        except Exception as e:
            print(f"pallas R={br} WC={wc}: FAILED {type(e).__name__} "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
