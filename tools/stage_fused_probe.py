#!/usr/bin/env python
"""Real-TPU timing: whole-stage fused Pallas kernel vs XLA composition.

Measures the last two DenseNet-UNet decoder stages at the tile-4096 engine
shapes (BASELINE.md round-3 lever).  Writes line-buffered progress to
/tmp/stage_probe.log (relay kills lose piped output otherwise — see memory
note axon-tpu-environment).

Usage: python tools/stage_fused_probe.py [--iters N] [--stages 4,5]
"""

import argparse
import sys
import time

LOG = open("/tmp/stage_probe.log", "a", buffering=1)


def log(msg):
    print(msg)
    LOG.write(msg + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="4,5")
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--cols", type=int, default=128)
    ap.add_argument("--skip-canonical", action="store_true",
                    help="only measure the Pallas kernel (the canonical XLA "
                         "composition is compile-pathological through the "
                         "remote endpoint; compare against cached bench "
                         "numbers instead)")
    args = ap.parse_args()

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpai_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from digipathai_tpu.ops.pallas.stage_fused import fused_up_stage

    log(f"backend={jax.default_backend()} rows={args.rows} cols={args.cols}")

    # (name, Hh, C, Cs, F): dense-UNet stages at tile 4096 + 2*128 halo;
    # "c" = small canary (compile/correctness gate before the big shapes)
    shapes = {
        "c": ("canary", 128, 64, 32, 64),
        "4": ("stage4", 1088, 128, 64, 96),
        "5": ("stage5", 2176, 96, 0, 64),
    }

    def canonical_fn(y, ka, ba, ma, aa, kb, bb, mb, ab, skip):
        import jax.lax as lax

        def conv(x, k):
            return lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        u = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
        a = jnp.maximum((conv(u, ka) + ba) * ma + aa, 0.0)
        if skip is not None:
            a = jnp.concatenate([a.astype(y.dtype), skip], -1)
        o = jnp.maximum((conv(a.astype(y.dtype), kb) + bb) * mb + ab, 0.0)
        return o.astype(y.dtype)

    for key in args.stages.split(","):
        name, hh, c, cs, f = shapes[key]
        rng = np.random.default_rng(0)
        # big activations are generated ON-DEVICE: host->device through the
        # relay runs at ~17 MB/s and a GB-scale transfer looks like a hang
        kg = jax.random.PRNGKey(0)
        y = jax.jit(lambda k: jax.random.normal(
            k, (1, hh, hh, c), jnp.bfloat16))(kg)
        ka = jnp.asarray(rng.normal(0, .1, (3, 3, c, f)), jnp.float32)
        kb = jnp.asarray(rng.normal(0, .1, (3, 3, f + cs, f)), jnp.float32)
        ba, bb, aa, ab = (jnp.asarray(rng.normal(0, .1, (f,)), jnp.float32)
                          for _ in range(4))
        ma, mb = (jnp.asarray(rng.uniform(.5, 1.5, (f,)), jnp.float32)
                  for _ in range(2))
        skip = (jax.jit(lambda k: jax.random.normal(
            k, (1, 2 * hh, 2 * hh, cs), jnp.bfloat16))(kg) if cs else None)
        log(f"{name}: inputs ready on device")

        canon = jax.jit(canonical_fn)

        def run(fn, label, **kw):
            t0 = time.time()
            try:
                out = fn(y, ka, ba, ma, aa, kb, bb, mb, ab, skip, **kw)
            except Exception as e:  # compile errors surface here
                log(f"{name} {label}: FAILED {type(e).__name__}: "
                    f"{str(e)[:500]}")
                return None
            s = float(jax.device_get(jnp.float32(out[0, 0, 0, 0])))
            log(f"{name} {label}: compile+first {time.time() - t0:.1f}s "
                f"(probe {s:.3f})")
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(y, ka, ba, ma, aa, kb, bb, mb, ab, skip, **kw)
            _ = float(jax.device_get(jnp.float32(out[0, 0, 0, 0])))
            dt = (time.time() - t0) / args.iters * 1e3
            log(f"{name} {label}: {dt:.2f} ms/iter (incl ~7ms dispatch)")
            return dt

        dc = None if args.skip_canonical else run(canon, "xla-canonical")
        df = run(fused_up_stage, "pallas-fused", block_rows=args.rows,
                 block_cols=args.cols)
        if dc and df:
            log(f"{name}: fused/canonical = {df / dc:.3f} "
                f"({dc / df:.2f}x speedup)")


if __name__ == "__main__":
    sys.exit(main())
