#!/usr/bin/env python
"""Sweep (tile size x batch) for the tile-mode forward (round 4).

Motivation: per computed pixel, batch-32 256^2 patch mode runs the SAME
dense network ~1.7x faster than the batch-1 4352^2 tile step (17.8 vs
10.2 Mpx/s on v5e — BASELINE.md r3/r4), so the giant-spatial program is
leaving locality on the table.  Round 3's tta_batch=5 A/B at tile 4096 was
neutral, but batching was never swept at SMALL tiles, where feature maps
approach VMEM scale.  If batched medium tiles recover patch-mode pixel
rates, the halo overhead (1.56x at 1024, 1.27x at 2048) is more than paid
for — with EXACT tile-mode semantics (each tile independent, same halo).

Reports per config: computed-pixel rate, eq-pps net of halo overhead.

Usage: python tools/tile_batch_probe.py [--model dense] [--iters 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tile, batch): batch chosen to keep computed pixels/step roughly equal
SWEEP = [
    (4096, 1),
    (2048, 1), (2048, 4),
    (1024, 1), (1024, 4), (1024, 12),
    (512, 8), (512, 32),
    (256, 32), (256, 64),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dense")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--s2dstem", type=int, default=1)
    ap.add_argument("--tta", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from digipathai_tpu.models.registry import build_model
    from digipathai_tpu.ops import tta as tta_ops
    from digipathai_tpu.ops.color import normalize_patches
    from digipathai_tpu.ops.s2d_input import pack_host, apply_chain_packed

    halo, stride = 128, 128
    tta = ["DEFAULT", "FLIP_LEFT_RIGHT", "ROTATE_90", "ROTATE_180",
           "ROTATE_270"][:args.tta]
    kw = {"s2d_stem": args.s2dstem} if args.s2dstem else {}
    if args.model == "deeplabv3":
        kw["aspp_pool_window"] = 256
    bundle = build_model(args.model, dtype=jnp.bfloat16, **kw)
    chains = tta_ops.effective_transforms(tta, faithful=False)
    lvl = args.s2dstem

    def make_step(tile, batch):
        """Per-model tile step over a BATCH of tiles: one lax.scan iteration
        per TTA chain, each a batch-``batch`` forward (mirrors the engine's
        ``build_model_tile_steps`` scan so the XLA program holds ONE traced
        forward — the unrolled form hit 400s+ remote compiles / crashes)."""

        def step(variables, tiles_u8):  # (B, side, side, C)
            x = normalize_patches(tiles_u8, dtype=jnp.bfloat16)
            if lvl:
                xts = jnp.stack(
                    [apply_chain_packed(x, c, level=lvl) for c in chains])
            else:
                xts = jnp.stack([tta_ops.apply_chain(x, c) for c in chains])

            def body(_, xt):  # xt: (B, side, side, C)
                p = bundle.apply_p1(variables, xt)  # (B, H, W)
                ch = (p.shape[-1] - tile) // 2
                if ch:
                    p = p[:, ch:-ch, ch:-ch]
                return 0, p.astype(jnp.float32)

            _, preds = jax.lax.scan(body, 0, xts)  # (T, B, tile, tile)
            s = sq = None
            for i, chain in enumerate(chains):
                inv = chain[-1] if chain else tta_ops.DEFAULT
                p = tta_ops.invert(preds[i][..., None], inv)[..., 0]
                s = p if s is None else s + p
                sq = p * p if sq is None else sq + p * p
            return s, sq

        return jax.jit(step)

    rng = np.random.default_rng(0)
    base = None
    for tile, batch in SWEEP:
        side = tile + 2 * halo
        t_u8 = rng.integers(0, 255, (batch, side, side, 3), np.uint8)
        if lvl:
            t_u8 = np.stack([pack_host(t, lvl) for t in t_u8])
        variables = bundle.init(side)
        step = make_step(tile, batch)
        t_dev = jnp.asarray(t_u8)
        try:
            t0 = time.time()
            s, q = step(variables, t_dev)
            _ = float(jax.device_get(jnp.mean(s)))
            tc = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                s, q = step(variables, t_dev)
            _ = float(jax.device_get(jnp.mean(s)))
            dt = (time.time() - t0) / args.iters
        except Exception as e:
            print(f"tile {tile:5d} x{batch:3d}  FAILED: {str(e)[:120]}",
                  flush=True)
            continue
        px_rate = batch * side * side / dt          # computed px/s (per TTA set)
        eq_pps = batch * tile * tile / (stride * stride) / dt
        if base is None:
            base = eq_pps
        print(f"tile {tile:5d} x{batch:3d}  {eq_pps:7.1f} eq-pps "
              f"({eq_pps / base:+4.2f}x)  computed {px_rate * len(chains) / 1e6:6.1f} "
              f"Mpx/s  (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
