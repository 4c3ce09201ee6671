#!/usr/bin/env python
"""Drive the segmentation engine across models and evaluate vs ground truth.

Functional parity with the reference's usage scripts
(``reference usage/usage.py:26-137``, ``usage/usage2.py:19-114``): run
``getSegmentation`` for each requested model (or the full ensemble), read the
written masks back at the coarsest level, compute IoU against a ``-gt``
ground-truth slide when present, and save a comparison figure.

Example:
    python examples/run_segmentation.py slide.tiff --models dense ensemble \
        --mode breast --out results/
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def evaluate(mask_path: str, gt_path: str) -> float:
    from digipathai_tpu.io.slide import Slide
    from digipathai_tpu.utils.metrics import dice

    with Slide(mask_path) as sm:
        lvl = sm.level_count - 1
        pred = sm.read_level(lvl)[:, :, 0] > 127
    with Slide(gt_path) as sg:
        lvl = sg.get_best_level_for_downsample(
            sg.dimensions[0] / pred.shape[1])
        gt = sg.read_level(lvl)[:, :, 0] > 0
    h = min(pred.shape[0], gt.shape[0])
    w = min(pred.shape[1], gt.shape[1])
    return dice(pred[:h, :w], gt[:h, :w])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("slide")
    ap.add_argument("--models", nargs="+", default=["ensemble"],
                    choices=["dense", "inception", "deeplabv3", "ensemble",
                             "epistemic"])
    ap.add_argument("--mode", default="colon",
                    choices=["colon", "liver", "breast"])
    ap.add_argument("--out", default="results")
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--stride", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tta", nargs="*", default=None,
                    help="e.g. FLIP_LEFT_RIGHT ROTATE_90")
    ap.add_argument("--crf", action="store_true")
    ap.add_argument("--gt", default=None,
                    help="ground-truth slide (defaults to <stem>-gt.<ext>)")
    args = ap.parse_args()

    from digipathai_tpu import getSegmentation

    os.makedirs(args.out, exist_ok=True)
    stem, ext = os.path.splitext(os.path.basename(args.slide))
    gt = args.gt or os.path.join(os.path.dirname(args.slide), f"{stem}-gt{ext}")

    rows = []
    for model in args.models:
        # "epistemic" = full ensemble with NO TTA: the uncertainty map then
        # reflects inter-model (epistemic) variance only
        # (reference usage/usage.py:46-49).
        quick = model not in ("ensemble", "epistemic")
        tta = [] if model == "epistemic" else args.tta
        tag = os.path.join(args.out, f"{stem}-{model}")
        t0 = time.time()
        getSegmentation(
            img_path=args.slide, patch_size=args.patch,
            stride_size=args.stride, batch_size=args.batch,
            tta_list=tta, crf=args.crf, quick=quick,
            model=model if quick else "dense", mode=args.mode,
            probs_path=f"{tag}-probs.tiff",
            mask_path=f"{tag}-dgai-mask.tiff",
            uncertainty_path=f"{tag}-dgai-uncertainty.tiff")
        secs = time.time() - t0
        iou = evaluate(f"{tag}-dgai-mask.tiff", gt) if os.path.exists(gt) else None
        rows.append((model, secs, iou))
        print(f"{model}: {secs:.1f}s" + (f", IoU={iou:.4f}" if iou else ""))

    try:
        plot(args.slide, args.out, stem, [m for m, _, _ in rows])
    except Exception as e:  # noqa: BLE001 — plotting is best-effort
        print(f"(no comparison figure: {e})")
    return 0


def plot(slide_path: str, out: str, stem: str, models):
    """4-panel comparison figure (reference usage/plotter.py pattern)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from digipathai_tpu.io.slide import Slide

    n = 1 + len(models)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    with Slide(slide_path) as s:
        axes[0].imshow(s.read_level(s.level_count - 1))
        axes[0].set_title("slide")
    for ax, model in zip(axes[1:], models):
        with Slide(os.path.join(out, f"{stem}-{model}-probs.tiff")) as sp:
            ax.imshow(sp.read_level(sp.level_count - 1)[:, :, 0],
                      cmap="inferno", vmin=0, vmax=255)
            ax.set_title(model)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(out, f"{stem}-comparison.png"), dpi=120)
    print(f"wrote {os.path.join(out, f'{stem}-comparison.png')}")


if __name__ == "__main__":
    raise SystemExit(main())
