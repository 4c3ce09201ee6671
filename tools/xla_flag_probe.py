#!/usr/bin/env python
"""A/B remote-TPU compiler options on the dense tile-mode forward (round 4).

Every structural rewrite of the narrow-conv encoder fat measured as an
in-model loss (BASELINE.md rounds 2-3); compiler-level scheduling/fusion
knobs are the one axis never swept.  XLA_FLAGS cannot carry TPU flags here
(the axon relay client hard-rejects names it does not know at local parse
time), but ``jit(f).lower(...).compile(compiler_options=...)`` ships the
options inside the compile request to the REMOTE compiler — verified
working.  Unknown option names fail per-config and are reported, not fatal.

Usage: python tools/xla_flag_probe.py [--tile 4096] [--iters 6]
One line per config: name, eq-pps, delta vs same-session baseline.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("baseline", None),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("licm_2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ("vmem_64m_lhs", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                      "xla_tpu_enable_latency_hiding_scheduler": "true"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--model", default="dense")
    ap.add_argument("--s2dstem", type=int, default=1)
    ap.add_argument("--configs", default=None)
    args = ap.parse_args()
    want = set(args.configs.split(",")) if args.configs else None

    import jax
    import jax.numpy as jnp
    import numpy as np

    from digipathai_tpu.engine.tile_infer import build_model_tile_steps
    from digipathai_tpu.models.registry import build_model
    from digipathai_tpu.ops.s2d_input import pack_host

    tile, halo, stride = args.tile, 128, 128
    kw = {"s2d_stem": args.s2dstem} if args.s2dstem else {}
    if args.model == "deeplabv3":
        kw = {"aspp_pool_window": 256, **kw}
    bundle = build_model(args.model, dtype=jnp.bfloat16, **kw)
    variables = bundle.init(tile + 2 * halo)
    tta = ["DEFAULT", "FLIP_LEFT_RIGHT", "ROTATE_90", "ROTATE_180",
           "ROTATE_270"]
    steps, _, _ = build_model_tile_steps([bundle], tta, tile, halo)
    step = steps[0]
    rng = np.random.default_rng(0)
    t_u8 = rng.integers(0, 255, (tile + 2 * halo, tile + 2 * halo, 3),
                        np.uint8)
    if args.s2dstem:
        t_u8 = pack_host(t_u8, args.s2dstem)
    t_dev = jnp.asarray(t_u8)

    lowered = step.lower(variables, t_dev)
    base_val = None
    for name, opts in CONFIGS:
        if want and name not in want and name != "baseline":
            continue
        t0 = time.time()
        try:
            comp = lowered.compile(compiler_options=opts)
        except Exception as e:  # unknown option name, resource error, ...
            print(f"{name:16s} COMPILE FAILED: {str(e)[:160]}", flush=True)
            continue
        tc = time.time() - t0
        s, q = comp(variables, t_dev)
        _ = float(jax.device_get(jnp.mean(s)))  # warm + completion fence
        t0 = time.time()
        for _ in range(args.iters):
            s, q = comp(variables, t_dev)
        _ = float(jax.device_get(jnp.mean(s)))
        dt = (time.time() - t0) / args.iters
        # per-model eq-pps on the 5-TTA step (matches BASELINE per-model rows)
        val = (tile * tile) / (stride * stride) / dt
        if base_val is None:
            base_val = val
        delta = (val / base_val - 1.0) * 100.0
        print(f"{name:16s} {val:8.1f} eq-pps  {delta:+5.1f}%  "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
