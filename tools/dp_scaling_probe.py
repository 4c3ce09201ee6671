#!/usr/bin/env python
"""Multi-device scaling probe on the virtual CPU mesh (VERDICT r4 item 2b).

Measures, at dp = 1/2/4/8 fake devices (``xla_force_host_platform_device_
count``), the two product multi-chip schemes:

1. **tile round-robin** (tile mode, ``tile_infer`` device round-robin):
   each device computes one WHOLE supertile; zero cross-chip traffic, so
   the only scaling cost is dispatch skew.  Work scales with dp (dp
   supertiles per timed step), so on this ONE-core host the ideal time is
   dp x t(1); efficiency = dp * t(1) / t(dp).
2. **patch grid-DP** (``parallel/inference.build_sharded_step``): a FIXED
   global batch sharded over dp devices, per-device scatter-add into a
   per-device accumulator, one all-reduce at the fetch.  Total arithmetic
   is constant, so on one core the ideal time is t(1); efficiency =
   t(1) / t(dp) — any drop is shard_map orchestration + the collective.

IMPORTANT framing (recorded in BASELINE.md): this host has ONE physical
core, so device arithmetic serializes and absolute rates mean nothing.
What the probe validates is the *communication/orchestration structure*:
efficiency ~1.0 here means the sharded programs add no work beyond the
serial arithmetic — on real chips the same programs run the arithmetic
concurrently, which is the "embarrassingly parallel" premise of the
<60 s = 12-16 chip budget (BASELINE.md roofline).

Usage:  python tools/dp_scaling_probe.py  (forces CPU; ~10 min of compiles)
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpai_jax_cache_cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from digipathai_tpu.engine.infer import build_step  # noqa: E402
from digipathai_tpu.engine.tile_infer import build_tile_step  # noqa: E402
from digipathai_tpu.models.registry import build_model  # noqa: E402
from digipathai_tpu.ops.stitch import make_accumulator  # noqa: E402
from digipathai_tpu.parallel import inference as par  # noqa: E402

PATCH, TILE, HALO = 128, 128, 64
MODEL = os.environ.get("DPAI_PROBE_MODEL", "dense")
ITERS = int(os.environ.get("DPAI_PROBE_ITERS", 5))
TTA = ["DEFAULT", "FLIP_LEFT_RIGHT"]


def fetch(x):
    return float(jax.device_get(jnp.sum(x)))


def time_tile_roundrobin(bundle, variables, dp):
    """dp supertiles dispatched to dp devices per timed step."""
    devs = jax.local_devices()[:dp]
    step = build_tile_step([bundle], TTA, TILE, HALO,
                           compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tile_u8 = rng.integers(0, 255, (TILE + 2 * HALO, TILE + 2 * HALO, 3),
                           np.uint8)
    tiles = [jax.device_put(jnp.asarray(tile_u8), d) for d in devs]
    varss = [jax.device_put((variables,), d) for d in devs]
    outs = [step(v, t) for v, t in zip(varss, tiles)]
    for m, _ in outs:
        fetch(m)  # compile + settle
    t0 = time.time()
    for _ in range(ITERS):
        outs = [step(v, t) for v, t in zip(varss, tiles)]
    for m, _ in outs:
        fetch(m)
    return (time.time() - t0) / ITERS


def time_patch_dp(bundle, variables, dp, global_batch=8):
    """Fixed global batch sharded over dp devices + flush all-reduce."""
    rng = np.random.default_rng(0)
    supertile = 512
    patches = jnp.asarray(rng.integers(
        0, 255, (global_batch, PATCH, PATCH, 3), np.uint8))
    offsets = jnp.asarray(
        rng.integers(0, supertile, (global_batch, 2)).astype(np.int32))
    valid = jnp.ones((global_batch,), bool)
    if dp == 1:
        step = build_step([bundle], TTA, PATCH)
        acc = make_accumulator(supertile, PATCH)
        acc = step((variables,), acc, patches, offsets, valid)
        fetch(acc)
        t0 = time.time()
        for _ in range(ITERS):
            acc = step((variables,), acc, patches, offsets, valid)
        fetch(acc)
        return (time.time() - t0) / ITERS
    mesh = par.make_dp_mesh(dp)
    step = par.build_sharded_step([bundle], TTA, PATCH, mesh)
    sharded = par.shard_batch(mesh, patches, offsets, valid)
    acc = par.make_sharded_accumulator(mesh, supertile, PATCH)
    acc = step((variables,), acc, *sharded)
    fetch(par.reduce_accumulator(mesh, acc))
    t0 = time.time()
    for _ in range(ITERS):
        acc = step((variables,), acc, *sharded)
    fetch(par.reduce_accumulator(mesh, acc))
    return (time.time() - t0) / ITERS


def main():
    n_dev = len(jax.local_devices())
    print(f"# {n_dev} {jax.local_devices()[0].platform} devices, "
          f"model={MODEL}, tile={TILE}+2*{HALO}, patch={PATCH}, "
          f"tta={len(TTA)}, iters={ITERS}")
    bundle = build_model(MODEL, dtype=jnp.float32)
    variables = bundle.init(PATCH)

    dps = [d for d in (1, 2, 4, 8) if d <= n_dev]
    print("\n== tile round-robin (work scales with dp; ideal t = dp*t1) ==")
    t1 = None
    for dp in dps:
        t = time_tile_roundrobin(bundle, variables, dp)
        t1 = t if dp == 1 else t1
        eff = dp * t1 / t
        print(f"dp={dp}: {t * 1e3:8.1f} ms/step  efficiency={eff:.3f}")

    print("\n== patch grid-DP (fixed global batch; ideal t = t1) ==")
    t1 = None
    for dp in dps:
        t = time_patch_dp(bundle, variables, dp)
        t1 = t if dp == 1 else t1
        eff = t1 / t
        print(f"dp={dp}: {t * 1e3:8.1f} ms/step  efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
