#!/usr/bin/env python
"""Time XLA's conv at the exact U-Net decoder full-res stage shapes.

Decoder stage shapes for tile 4096 (+2x128 halo): stage 5 runs at 4352^2
with 96->64 and 64->64 3x3 convs; stage 4 at 2176^2 with 96/128 channels.
Chains REPS convs inside one jitted scan (mxu_probe-style) so the axon
relay's ~7 ms dispatch overhead cancels; reports achieved TFLOP/s and the
share of v5e bf16 peak. This tells us whether a Pallas conv kernel for the
narrow full-res stages is worth building.
"""
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

REPS = 8


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    return (time.time() - t0) / iters / REPS


def chain(cin, cout):
    def fn(x, k):
        def body(x, _):
            y = lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            # feed back through the leading cin channels to keep the
            # chain live whatever cin/cout are
            y = y[..., :cin] if cout >= cin else jnp.concatenate(
                [y] * (cin // cout + 1), -1)[..., :cin]
            return (y * jnp.bfloat16(0.5)).astype(jnp.bfloat16), 0.
        y, _ = lax.scan(body, x, None, length=REPS)
        return y
    return jax.jit(fn)


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    # (H, W, cin, cout, equiv_flops_scale): equiv_flops_scale divides the
    # nominal FLOPs to express throughput in terms of the CANONICAL conv the
    # packed variant replaces (W-packing factor P costs P x the FLOPs).
    cases = [
        (4352, 4352, 96, 64, 1),    # stage 5 conv A (after fused upsample)
        (4352, 4352, 64, 64, 1),    # stage 5 conv B
        (2176, 2176, 96, 96, 1),    # stage 4 conv A
        (2176, 2176, 160, 96, 1),   # stage 4 conv B (with skip concat)
        (1088, 1088, 384, 128, 1),  # stage 3 (reference width)
        # W-packed equivalents of stage-5 convB (64->64@4352^2):
        (4352, 2176, 128, 128, 2),  # P=2: free reshape, 2x FLOPs
        (4352, 1088, 256, 256, 4),  # P=4: free reshape, 4x FLOPs
        # W-packed stage-4 convA (96->96@2176^2), P=2:
        (2176, 1088, 192, 192, 2),
    ]
    for h, w, cin, cout, scale in cases:
        x = jnp.asarray(rng.normal(0, 0.5, (1, h, w, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.bfloat16)
        flops = 2 * h * w * cin * cout * 9
        eq = flops / scale
        try:
            dt = timed(chain(cin, cout), x, k)
            tag = f" (P={scale} packed, canonical-equiv {eq/dt/1e12:5.1f} T/s)" \
                if scale > 1 else ""
            print(f"conv3x3 {h}x{w} {cin:4d}->{cout:4d}: {dt*1e3:8.2f} ms  "
                  f"{flops/dt/1e12:6.1f} T/s ({flops/dt/197e12*100:5.1f}% "
                  f"of bf16 peak){tag}", flush=True)
        except Exception as e:
            print(f"conv3x3 {h}x{w} {cin}->{cout}: FAILED "
                  f"{type(e).__name__} {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
