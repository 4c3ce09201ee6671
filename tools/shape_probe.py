#!/usr/bin/env python
"""Probe per-pixel model throughput vs input shape at constant pixel count.

Patch mode (batch 32 x 256px) and tile mode (1 x 2304px) push the same
models at very different shapes; round-1 measured ~2x per-pixel efficiency
loss at tile shapes.  This tool times each (batch, side) pair with equal
total pixels to locate where the efficiency falls off, guiding the engine's
sub-tiling choice (engine/tile_infer.py).

    python tools/shape_probe.py dense "64:256,16:512,4:1024,1:2048"
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from digipathai_tpu.models.registry import build_model

    model = sys.argv[1] if len(sys.argv) > 1 else "dense"
    spec = sys.argv[2] if len(sys.argv) > 2 else "64:256,16:512,4:1024,1:2048"
    shapes = [tuple(int(v) for v in s.split(":")) for s in spec.split(",")]

    bundle = build_model(model, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    for batch, side in shapes:
        variables = bundle.init(side)
        fn = jax.jit(lambda v, x: bundle.apply(v, x))
        x = jnp.asarray(rng.random((batch, side, side, 3), np.float32))
        try:
            out = fn(variables, x)
            _ = float(jax.device_get(out.reshape(-1)[0]))
        except Exception as e:  # noqa: BLE001 - OOM etc.
            print(f"{model} {batch}x{side}^2: FAILED {str(e)[:120]}")
            continue
        iters = 6
        t0 = time.time()
        for _ in range(iters):
            out = fn(variables, x)
        _ = float(jax.device_get(out.reshape(-1)[0]))
        dt = (time.time() - t0) / iters
        mpx = batch * side * side / 1e6
        print(f"{model} {batch}x{side}^2: {dt * 1e3:8.1f} ms  "
              f"{mpx / dt:8.1f} Mpx/s")


if __name__ == "__main__":
    main()
