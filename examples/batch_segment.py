#!/usr/bin/env python
"""Segment every slide in a directory (BASELINE config-5 shape: a test-set
sweep with the patch grid of each slide sharded across all visible chips).

    python examples/batch_segment.py /data/camelyon_test --mode breast \
        --inference-mode tile
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("slide_dir")
    ap.add_argument("--mode", default="breast",
                    choices=["colon", "liver", "breast"])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--model", default="dense")
    ap.add_argument("--tta", nargs="*", default=None)
    ap.add_argument("--crf", action="store_true")
    ap.add_argument("--inference-mode", default="patch",
                    choices=["patch", "tile"])
    ap.add_argument("--resume", action="store_true",
                    help="skip completed supertiles of interrupted runs")
    args = ap.parse_args()

    from digipathai_tpu import Slide, getSegmentation
    from digipathai_tpu.server.app import get_mask_path_basename

    slides = []
    for name in sorted(os.listdir(args.slide_dir)):
        p = os.path.join(args.slide_dir, name)
        if not Slide.detect_format(p):
            continue
        if "dgai-mask" in name or "dgai-uncertainty" in name or "-gt" in name:
            continue
        slides.append(p)
    print(f"{len(slides)} slides")

    total_t0 = time.time()
    for i, p in enumerate(slides):
        root, ext = os.path.splitext(p)
        t0 = time.time()
        getSegmentation(
            img_path=p, quick=args.quick, model=args.model, mode=args.mode,
            tta_list=args.tta, crf=args.crf,
            probs_path=root + "-dgai-probs" + ext,
            mask_path=get_mask_path_basename(p) + ext,
            uncertainty_path=root + "-dgai-uncertainty" + ext,
            inference_mode=args.inference_mode, resume=args.resume)
        print(f"[{i + 1}/{len(slides)}] {os.path.basename(p)}: "
              f"{time.time() - t0:.1f}s")
    print(f"total: {time.time() - total_t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
