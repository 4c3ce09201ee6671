#!/usr/bin/env python
"""Per-layer activation-diff harness: flax model (from a Keras .h5) vs
golden reference activations.

Purpose (SURVEY.md §7 "bit-level parity with TF1" risk): once the trained
reference checkpoints are reachable, numerical parity must be checked layer
by layer, not just end to end. This harness is network-independent: it takes
any Keras ``save_weights`` .h5 plus a golden ``.npz`` of per-layer outputs
and reports the max-abs diff per layer in model order, so a conversion or
architecture mismatch localizes to the first diverging layer.

Golden .npz format
------------------
- ``input``: (N, H, W, 3) float32 — the NORMALIZED input fed to the
  reference model (the reference normalizes with (x/255 - mean)/std before
  predict, ``reference DigiPathAI/Segmentation.py:127-133``).
- one array per Keras layer name (verbatim, e.g. ``conv1/conv`` or
  ``aspp0_BN``): that layer's output tensor (N, H, W, C).

Generating goldens from the TF1 reference (needs GPU + network, documented
for when they exist)::

    model = unet_densenet121((None, None), weights_path)  # reference builder
    outs = [l.output for l in model.layers if l.name in WANTED]
    fn = keras.backend.function(model.inputs, outs)
    np.savez('golden.npz', input=x, **dict(zip(WANTED, fn([x]))))

Self-test goldens (no TF needed) come from ``--emit-golden``: the flax
model's own intermediates are written in the same format, which exercises
the full path (h5 -> convert -> forward -> capture -> compare) today.

Usage::

    python tools/activation_diff.py --model dense --h5 ckpt.h5 \
        --golden golden.npz [--tol 1e-4]
    python tools/activation_diff.py --model dense --h5 ckpt.h5 \
        --emit-golden golden.npz [--patch 64] [--seed 0]
"""
from __future__ import annotations

import argparse
import sys


def _capture_activations(model_name: str, h5_path: str, x, dtype=None):
    """Run the flax model (weights from h5) capturing every submodule output.

    Returns (keras_layer_name -> np.ndarray) with flax '__' names mapped
    back to Keras '/' names, plus the final model output under '__output__'.
    """
    import jax.numpy as jnp
    import numpy as np

    from digipathai_tpu.models.convert_h5 import keras_h5_to_flax
    from digipathai_tpu.models.registry import build_model

    # canonical execution paths: the chunked encoder computes the same
    # function but inlines the per-layer BN/conv math, so the Keras-named
    # submodule outputs this tool mirrors would not be captured
    kw = {"chunked_encoder": False} if "dense" in model_name else {}
    b = build_model(model_name, dtype=dtype or jnp.float32, **kw)
    template = b.init(x.shape[1])
    variables = keras_h5_to_flax(h5_path, template)

    out, state = b.module.apply(
        variables, jnp.asarray(x), train=False,
        capture_intermediates=True, mutable=["intermediates"])

    acts = {}
    inter = state["intermediates"]

    def walk(tree, prefix):
        for k, v in tree.items():
            if k == "__call__":
                if not prefix:  # root module output: reported as __output__
                    continue
                if isinstance(v[0], (tuple, list)):
                    continue  # parameter containers (ConvParams/BNParams)
                # v is a tuple of outputs (one per call; names are unique)
                acts[prefix.replace("__", "/")] = np.asarray(
                    v[0], dtype=np.float32)
            elif isinstance(v, dict):
                walk(v, f"{prefix}.{k}" if prefix else k)

    walk(inter, "")
    acts["__output__"] = np.asarray(out, dtype=np.float32)
    return acts


def activation_diffs(model_name: str, h5_path: str, golden: dict,
                     dtype=None) -> list:
    """Compare flax activations against a golden dict (see module docstring).

    Returns [(layer, max_abs_diff, golden_shape_ok)] in golden-file order
    for every golden key that names a layer (skips 'input').
    """
    import numpy as np

    acts = _capture_activations(model_name, h5_path, golden["input"],
                                dtype=dtype)
    rows = []
    for k in golden:
        if k == "input":
            continue
        g = np.asarray(golden[k], dtype=np.float32)
        if k not in acts:
            rows.append((k, float("nan"), False))
            continue
        a = acts[k]
        if a.shape != g.shape:
            rows.append((k, float("inf"), False))
            continue
        rows.append((k, float(np.abs(a - g).max()), True))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", required=True,
                    help="registry name: dense/inception/deeplabv3/...")
    ap.add_argument("--h5", required=True, help="Keras save_weights .h5")
    ap.add_argument("--golden", help="golden .npz to compare against")
    ap.add_argument("--emit-golden", metavar="PATH",
                    help="write this model's own activations as a golden .npz")
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args(argv)

    import numpy as np

    if args.emit_golden:
        rng = np.random.default_rng(args.seed)
        # normalized-input distribution (reference mean/std normalization)
        x = rng.normal(0.0, 1.0, (1, args.patch, args.patch, 3)).astype(
            np.float32)
        acts = _capture_activations(args.model, args.h5, x)
        np.savez_compressed(args.emit_golden, input=x, **acts)
        print(f"wrote {len(acts)} layer activations -> {args.emit_golden}")
        return 0

    if not args.golden:
        ap.error("need --golden or --emit-golden")
    with np.load(args.golden) as z:
        golden = {k: z[k] for k in z.files}
    rows = activation_diffs(args.model, args.h5, golden)
    worst, first_bad = 0.0, None
    for layer, diff, ok in rows:
        status = "OK" if ok and diff <= args.tol else "FAIL"
        if status == "FAIL" and first_bad is None:
            first_bad = layer
        worst = max(worst, diff if diff == diff else float("inf"))
        print(f"{status:4s} {layer:50s} max|Δ| = {diff:.3e}")
    print(f"worst max|Δ| = {worst:.3e} over {len(rows)} layers (tol {args.tol})")
    if first_bad is not None:
        print(f"first diverging layer: {first_bad}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
