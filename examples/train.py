#!/usr/bin/env python
"""Fine-tune a segmentation model on annotated slides, TPU-mesh-sharded.

The reference ships inference only (training lives in the companion paper,
``reference README.md:9-18``); this example closes the loop with the
framework's own training subsystem (``digipathai_tpu/training``): tissue
patches are sampled with the production planner, labels come from a
``-gt`` slide, the train step is jitted (and, with >1 device, pjit-sharded
over the (dp, sp, mp) mesh of ``parallel/mesh.py``), and the result is
saved into the engine's converted-weights cache so ``getSegmentation``
picks it up on the next run.

    python examples/train.py slide.tiff --gt slide-gt.tiff \
        --model dense --mode colon --steps 200 --batch 16

Patches keep the engine's transposed (x, y, c) orientation
(``engine/loader.py:_read_patch``) so the fine-tuned weights match
inference exactly.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np


def sample_coords(plan, n: int, seed: int) -> np.ndarray:
    """(n, 2) level-0 patch top-lefts drawn from the tissue plan."""
    coords = np.concatenate([g.coords[g.valid] for g in plan.groups])
    if not len(coords):
        raise SystemExit("no tissue patches found in the slide")
    rng = np.random.default_rng(seed)
    return coords[rng.integers(0, len(coords), n)]


def read_batch(slide, gt, coords, patch: int):
    """uint8 (B, P, P, 3) patches + one-hot (B, P, P, 2) labels, both in the
    engine's (x, y, c) orientation."""
    x = np.empty((len(coords), patch, patch, 3), np.uint8)
    y = np.empty((len(coords), patch, patch), np.int64)
    for i, (cx, cy) in enumerate(coords):
        x[i] = slide.read_region((int(cx), int(cy)), 0,
                                 (patch, patch)).transpose(1, 0, 2)
        lab = gt.read_region((int(cx), int(cy)), 0, (patch, patch))
        y[i] = (lab[:, :, 0] > 127).T
    return x, np.eye(2, dtype=np.float32)[y]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("slide")
    ap.add_argument("--gt", default=None,
                    help="ground-truth slide (defaults to <stem>-gt.<ext>)")
    ap.add_argument("--model", default="dense",
                    choices=["dense", "inception", "deeplabv3", "tiny"])
    ap.add_argument("--mode", default="colon",
                    choices=["colon", "liver", "breast"])
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--from-scratch", action="store_true",
                    help="random init instead of the pretrained checkpoint")
    ap.add_argument("--out", default=None,
                    help="output pickle (default: the engine's converted "
                         "cache, so getSegmentation uses the result)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from digipathai_tpu.engine.planner import plan_patches
    from digipathai_tpu.io.slide import Slide
    from digipathai_tpu.models.registry import build_model
    from digipathai_tpu.models import weights as weights_lib
    from digipathai_tpu.training.train import (init_state, make_train_step,
                                               shard_train_step)

    stem, ext = os.path.splitext(args.slide)
    gt_path = args.gt or f"{stem}-gt{ext}"
    if not os.path.exists(gt_path):
        raise SystemExit(f"ground truth not found: {gt_path}")

    slide, gt = Slide(args.slide), Slide(gt_path)
    plan = plan_patches(slide, patch=args.patch, stride=args.patch // 2,
                        batch=args.batch)
    print(f"{plan.total_patches} tissue patches at stride {args.patch // 2}")

    bundle = build_model(args.model)
    state = init_state(bundle, args.patch, learning_rate=args.lr)
    variables, opt_state = state.variables, state.opt_state
    if not args.from_scratch and args.model != "tiny":  # tiny: tests only
        variables = weights_lib.load_variables(
            bundle, args.mode, args.model, args.patch)

    step = make_train_step(bundle, learning_rate=args.lr)
    devices = jax.local_devices()
    if len(devices) > 1:
        from digipathai_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(len(devices))
        print(f"mesh: {dict(mesh.shape)}")
        variables = mesh_lib.shard_variables(variables, mesh)
        opt_state = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, jax.sharding.NamedSharding(
                mesh, mesh_lib.param_spec(getattr(l, "shape", ()),
                                          mesh.shape["mp"])))
            if hasattr(l, "shape") else l, opt_state)
        step = shard_train_step(step, mesh, variables, opt_state)
        if args.batch % mesh.shape["dp"]:
            raise SystemExit(
                f"--batch must be divisible by dp={mesh.shape['dp']}")
    else:
        step = jax.jit(step)

    t0 = time.time()
    for i in range(args.steps):
        coords = sample_coords(plan, args.batch, args.seed + i)
        xb, yb = read_batch(slide, gt, coords, args.patch)
        x = (jnp.asarray(xb).astype(jnp.float32) - 128.0) / 128.0
        variables, opt_state, loss = step(variables, opt_state, x,
                                          jnp.asarray(yb))
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}  "
                  f"{time.time() - t0:.1f}s")

    out = args.out
    if out is None:
        fam = weights_lib.MODES[args.mode]
        out = str(weights_lib.cache_dir() / "converted"
                  / f"{fam}_{args.model}.flax.pkl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    variables = jax.device_get(variables)
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(variables, f)
    os.replace(tmp, out)
    print(f"saved fine-tuned weights -> {out}")
    slide.close()
    gt.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
