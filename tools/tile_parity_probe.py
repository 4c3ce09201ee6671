#!/usr/bin/env python
"""Quantify patch-mode vs tile-mode map deltas per model (VERDICT item 3).

Runs getSegmentation twice (inference_mode=patch / tile) on a synthetic
H&E-like slide with fixed-seed random weights and reports, per model:
max|Δprob| over tissue, mean|Δprob|, and Dice between the two thresholded
masks. Patch mode is the reference-parity path; tile mode differs only
within a receptive-field fringe of old patch borders (plus DeepLab ASPP
context, patch-localized via aspp_pool_window). Numbers land in PARITY.md.

Usage: python tools/tile_parity_probe.py [model ...]  (default: all three)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DPAI_OFFLINE", "1")


def run(model, d, slide_path):
    import numpy as np

    from digipathai_tpu.engine.segmentation import getSegmentation
    from digipathai_tpu.io.tiff_py import TiffReader

    maps = {}
    for mode in ("patch", "tile"):
        base = os.path.join(d, f"{model}-{mode}")
        getSegmentation(
            img_path=slide_path, patch_size=256, stride_size=128,
            batch_size=8, quick=True, model=model, mode="breast",
            tta_list=["FLIP_LEFT_RIGHT", "ROTATE_90"],
            probs_path=base + "-p.tiff", mask_path=base + "-m.tiff",
            uncertainty_path=base + "-u.tiff", supertile=1024,
            num_workers=4, data_parallel=False, inference_mode=mode,
            save_float_probs=True)
        with TiffReader(base + "-p.tiff.f32.tiff") as r:
            maps[mode] = np.asarray(r.read_whole(0), np.float32).squeeze()
    return maps


def main():
    import numpy as np

    from tests.fixtures import make_synthetic_slide

    models = sys.argv[1:] or ["dense", "inception", "deeplabv3"]
    d = tempfile.mkdtemp(prefix="dpai_parity_")
    os.environ.setdefault("DPAI_CACHE", os.path.join(d, "cache"))
    slide_path = os.path.join(d, "parity.tiff")
    make_synthetic_slide(slide_path, 2048, 2048, seed=11)

    for model in models:
        maps = run(model, d, slide_path)
        p, t = maps["patch"], maps["tile"]
        # compare where patch mode computed anything (tissue patches)
        both = (p > 0) | (t > 0)
        diff = np.abs(p - t)[both]
        mp, mt = p >= 0.3, t >= 0.3
        inter = (mp & mt).sum()
        dice = 2 * inter / max(mp.sum() + mt.sum(), 1)
        print(f"{model:10s} cmp px={int(both.sum())}: "
              f"max|dP|={diff.max():.4f} mean|dP|={diff.mean():.5f} "
              f"p99|dP|={np.percentile(diff, 99):.4f} "
              f"Dice(mask)={dice:.5f}", flush=True)


if __name__ == "__main__":
    main()
