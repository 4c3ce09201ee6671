#!/usr/bin/env python
"""Derisk the fused DenseNet-layer Pallas kernel (see BASELINE.md round 3):
does a narrow-N (C_out=32) 3x3 conv via the existing strip-DMA kernel beat
XLA's in-block lowering at the dense-block shapes?

Shapes (tile 4096 -> input 4352^2): block1 runs at 1088^2 (C 128->32 3x3),
block2 at 544^2.  XLA's measured whole-block cost is ~8.5 ms/layer (block1,
tools/encoder_probe.py); the MXU lane ceiling (N=32 padded to 128 lanes)
allows ~2-4 ms.

Rows: per-op ms on the real chip.
  xla_3x3_b1      canonical conv 3x3 128->32 @1088^2 (+affine+relu)
  pallas_3x3_b1   ops/pallas/conv_fused.fused_conv3x3 same op
  xla_layer_b1    full dense layer: affine+relu+1x1(224->128)+affine+relu+3x3
  xla_3x3_b2 / pallas_3x3_b2  same at 544^2
Usage: python tools/dense_layer_probe.py [iters]
"""

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
        print(json.dumps({"tag": tag, "error": str(e)[:300]}), flush=True)
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


def conv(x, k, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from digipathai_tpu.ops.pallas.conv_fused import fused_conv3x3

    key = jax.random.PRNGKey(0)
    for tag, side in (("b1", 1088), ("b2", 544)):
        x = jax.random.normal(key, (1, side, side, 128), jnp.bfloat16)
        k3 = jax.random.normal(key, (3, 3, 128, 32), jnp.float32) * 0.05
        mul = jnp.ones((32,), jnp.float32)
        add = jnp.zeros((32,), jnp.float32)

        def xla_3x3(x, k3, mul, add):
            return jax.nn.relu(conv(x, k3) * mul.astype(x.dtype)
                               + add.astype(x.dtype))

        time_fn(xla_3x3, (x, k3, mul, add), iters, f"xla_3x3_{tag}")
        time_fn(lambda x, k3, mul, add: fused_conv3x3(
            x, k3, None, mul, add, relu=True),
            (x, k3, mul, add), iters, f"pallas_3x3_{tag}")

        # full canonical layer at this res: in 224 ch (block1 mid-block)
        xin = jax.random.normal(key, (1, side, side, 224), jnp.bfloat16)
        m0 = jnp.ones((224,), jnp.float32)
        a0 = jnp.zeros((224,), jnp.float32)
        k1 = jax.random.normal(key, (1, 1, 224, 128), jnp.float32) * 0.05
        m1 = jnp.ones((128,), jnp.float32)
        a1 = jnp.zeros((128,), jnp.float32)

        def xla_layer(xin, m0, a0, k1, m1, a1, k3):
            h = jax.nn.relu(xin * m0.astype(xin.dtype) + a0.astype(xin.dtype))
            h = conv(h, k1)
            h = jax.nn.relu(h * m1.astype(h.dtype) + a1.astype(h.dtype))
            return conv(h, k3)

        time_fn(xla_layer, (xin, m0, a0, k1, m1, a1, k3), iters,
                f"xla_layer_{tag}")


if __name__ == "__main__":
    main()
