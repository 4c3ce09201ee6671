#!/usr/bin/env python
"""Probe per-model forward FLOPs via XLA cost analysis (CPU, no TPU needed).

Usage: JAX_PLATFORMS=cpu python tools/flops_probe.py [patch] [tile]
Prints FLOPs per forward for each ensemble model at patch size and at
tile+halo size, plus derived speed-of-light patches/s/chip on v5e
(197 bf16 TFLOP/s peak).
"""
import sys

import jax
import jax.numpy as jnp


def flops_of(bundle, size):
    x = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    variables = bundle.init(size)
    fn = jax.jit(lambda v, x: bundle.apply(v, x))
    c = fn.lower(variables, x).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", float("nan"))


def main():
    jax.config.update("jax_platforms", "cpu")
    from digipathai_tpu.models.registry import build_model

    patch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    halo = 128
    peak = 197e12  # v5e bf16
    for name in ["dense", "inception", "deeplabv3"]:
        b = build_model(name, dtype=jnp.bfloat16)
        fp = flops_of(b, patch)
        ft = flops_of(b, tile + 2 * halo)
        # tile mode: 5 TTA forwards; eq patches per tile = (tile/128)^2
        eq = (tile / 128.0) ** 2
        sol_tile = peak / (5 * ft / eq)
        sol_patch = peak / (5 * fp)
        print(f"{name:10s} patch{patch}: {fp/1e9:8.1f} GF  "
              f"tile{tile}+2x{halo}: {ft/1e9:9.1f} GF "
              f"({ft/(tile+2*halo)**2/1e6:.3f} MF/px)  "
              f"SoL eq-pps(tile)={sol_tile:7.0f}  SoL pps(patch)={sol_patch:6.0f}")


if __name__ == "__main__":
    main()
