"""Tile-vs-patch deviation REGRESSION BOUND (VERDICT r2 item 3).

PARITY.md quantifies the tile-mode fringe on the real models with
``tools/tile_parity_probe.py`` (TPU, one fixture).  That probe is a
measurement, not a guard: nothing failed if a decoder change widened the
fringe.  This test pins the bound in-suite on CPU across three fixtures
with a real CNN ("tiny"): interior probabilities must agree tightly and
the thresholded masks must stay near-identical, or the suite fails.

The deviation being bounded is by design (SURVEY.md §2.4 analog): tile mode
removes per-patch SAME-padding borders, so predictions differ only within a
receptive-field fringe of the old patch borders.
"""

import numpy as np
import pytest


def _run(model, d, slide_path, mode):
    from digipathai_tpu.engine.segmentation import getSegmentation
    from digipathai_tpu.io.tiff_py import TiffReader

    base = str(d / f"{model}-{mode}")
    getSegmentation(
        img_path=slide_path, patch_size=128, stride_size=64, batch_size=8,
        quick=True, model=model, mode="breast",
        tta_list=["FLIP_LEFT_RIGHT"],
        probs_path=base + "-p.tiff", mask_path=base + "-m.tiff",
        uncertainty_path=base + "-u.tiff", supertile=384, num_workers=2,
        data_parallel=False, save_float_probs=True, inference_mode=mode,
        compute_dtype=np.float32)
    with TiffReader(base + "-p.tiff.f32.tiff") as r:
        return np.asarray(r.read_whole(0), np.float32).squeeze()


@pytest.mark.parametrize("seed", [11, 23, 57])
def test_tile_patch_parity_bound(seed, tmp_path, monkeypatch):
    from tests.fixtures import make_synthetic_slide

    monkeypatch.setenv("DPAI_OFFLINE", "1")
    monkeypatch.setenv("DPAI_CACHE", str(tmp_path / "cache"))
    slide = str(tmp_path / f"parity-{seed}.tiff")
    make_synthetic_slide(slide, 512, 512, seed=seed)

    p = _run("tiny", tmp_path, slide, "patch")
    t = _run("tiny", tmp_path, slide, "tile")

    # compare only where both configurations computed (tile mode covers
    # whole supertiles, patch mode only strided patches — by design)
    both = (p > 0) & (t > 0)
    assert both.sum() > 50_000
    diff = np.abs(p - t)[both]
    mp, mt = (p >= 0.3) & both, (t >= 0.3) & both
    dice = 2 * (mp & mt).sum() / max(mp.sum() + mt.sum(), 1)
    print(f"seed {seed}: p99|dP|={np.percentile(diff, 99):.4f} "
          f"mean|dP|={diff.mean():.5f} Dice={dice:.5f} "
          f"cmp px={int(both.sum())}")

    # bounds: measured p99|dP| ~= 0.078, mean|dP| ~= 0.006, Dice ~= 0.957
    # across the three fixtures (random-weight tiny CNN whose outputs
    # hover near the 0.3 threshold — trained models measure Dice 1.0 in
    # PARITY.md; the random-weight Dice is the stricter canary).  Pinned
    # at ~2x measured: a decoder change that widens the patch-border
    # fringe (or any tile-path bug) trips these.
    assert np.percentile(diff, 99) < 0.15, \
        f"tile fringe widened: p99|dP|={np.percentile(diff, 99):.4f}"
    assert diff.mean() < 0.015, f"mean|dP| degraded: {diff.mean():.5f}"
    assert float(dice) > 0.92, f"mask Dice degraded: {dice:.5f}"
