#!/usr/bin/env python
"""Generate a synthetic H&E-like demo slide (+ ground truth) to try the
framework without real data:

    python examples/make_demo_slide.py demo/ --size 4096 3072
    digipathai -s demo/            # then open http://127.0.0.1:8080
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--size", nargs=2, type=int, default=[2048, 1536],
                    metavar=("W", "H"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from digipathai_tpu.io.backend import write_pyramid
    from tests.fixtures import render_he_like

    os.makedirs(args.out_dir, exist_ok=True)
    w, h = args.size
    img, tissue, lesion = render_he_like(w, h, args.seed)
    slide = os.path.join(args.out_dir, "demo-slide.tiff")
    gt = os.path.join(args.out_dir, "demo-slide-gt.tiff")
    write_pyramid(slide, img, compression="jpeg", quality=92, mpp=0.5,
                  description="DigiPathAI-TPU synthetic demo")
    write_pyramid(gt, (lesion * 255).astype(np.uint8), compression="deflate")
    print(slide)
    print(gt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
