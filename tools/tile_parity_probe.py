#!/usr/bin/env python
"""Quantify map deltas between engine configurations, per model.

Default comparison (VERDICT round-1 item 3): inference_mode patch vs tile.
``--quant`` instead compares exact vs int8 (quantized=True) in patch mode.
Runs getSegmentation twice per model on a synthetic H&E-like slide with
fixed-seed random weights and reports max|Δprob| over tissue, mean|Δprob|,
and Dice between the two thresholded masks. Numbers land in PARITY.md /
BASELINE.md.

Usage: python tools/tile_parity_probe.py [--quant] [model ...]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DPAI_OFFLINE", "1")


def run(model, d, slide_path, variants):
    import numpy as np

    from digipathai_tpu.engine.segmentation import getSegmentation
    from digipathai_tpu.io.tiff_py import TiffReader

    maps = {}
    for label, kw in variants:
        base = os.path.join(d, f"{model}-{label}")
        getSegmentation(
            img_path=slide_path, patch_size=256, stride_size=128,
            batch_size=8, quick=True, model=model, mode="breast",
            tta_list=["FLIP_LEFT_RIGHT", "ROTATE_90"],
            probs_path=base + "-p.tiff", mask_path=base + "-m.tiff",
            uncertainty_path=base + "-u.tiff", supertile=1024,
            num_workers=4, data_parallel=False,
            save_float_probs=True, **kw)
        with TiffReader(base + "-p.tiff.f32.tiff") as r:
            maps[label] = np.asarray(r.read_whole(0), np.float32).squeeze()
    return maps


def main():
    import numpy as np

    from tests.fixtures import make_synthetic_slide

    args = sys.argv[1:]
    quant = "--quant" in args
    args = [a for a in args if not a.startswith("--")]
    models = args or ["dense", "inception", "deeplabv3"]
    if quant:
        variants = [("exact", {"inference_mode": "patch"}),
                    ("int8", {"inference_mode": "patch", "quantized": True})]
    else:
        variants = [("patch", {"inference_mode": "patch"}),
                    ("tile", {"inference_mode": "tile"})]
    d = tempfile.mkdtemp(prefix="dpai_parity_")
    os.environ.setdefault("DPAI_CACHE", os.path.join(d, "cache"))
    slide_path = os.path.join(d, "parity.tiff")
    make_synthetic_slide(slide_path, 2048, 2048, seed=11)

    for model in models:
        maps = run(model, d, slide_path, variants)
        (la, p), (lb, t) = [(v[0], maps[v[0]]) for v in variants]
        # Compare ONLY where both configurations computed (probabilities are
        # written over count>0 pixels and are never exactly 0 there). Tile
        # mode intentionally covers whole supertiles while patch mode only
        # covers strided patches — that coverage difference is by design,
        # reported separately, and must not pollute the value comparison.
        cp, ct = p > 0, t > 0
        both = cp & ct
        diff = np.abs(p - t)[both]
        mp, mt = (p >= 0.3) & both, (t >= 0.3) & both
        inter = (mp & mt).sum()
        dice = 2 * inter / max(mp.sum() + mt.sum(), 1)
        print(f"{model:10s} {la} vs {lb} cmp px={int(both.sum())} "
              f"(only-{la} {int((cp & ~ct).sum())}, only-{lb} "
              f"{int((ct & ~cp).sum())}): "
              f"max|dP|={diff.max():.4f} mean|dP|={diff.mean():.5f} "
              f"p99|dP|={np.percentile(diff, 99):.4f} "
              f"Dice(mask)={dice:.5f}", flush=True)


if __name__ == "__main__":
    main()
